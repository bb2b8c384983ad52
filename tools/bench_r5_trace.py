"""A/B bench of wavefront trace variants on the real chip (r5).

Usage: python tools/bench_r5_trace.py [scene.xml] slim slimg slimg16 ...
Renders full 640x480x2spp frames per variant (pipelined, real readback)
and prints Msamples/s.  Compiles are AOT-independent per variant; the
persistent-process loop amortizes them out of the timed region.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathtracer_cuda_interactive_tpu.utils.config import setup_jax
setup_jax()

import jax
import jax.numpy as jnp

from pathtracer_cuda_interactive_tpu.models.bricks import BrickSet
from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
from pathtracer_cuda_interactive_tpu.ops.camera import Camera, camera_ray_data
from pathtracer_cuda_interactive_tpu.ops.wavefront import (
    render_samples_wavefront)

W, H, SPF, FRAMES = 640, 480, 2, 6


def main():
    args = sys.argv[1:]
    scene_path = "/root/reference/scenes/bunny/bunny.xml"
    if args and args[0].endswith(".xml"):
        scene_path = args.pop(0)
    variants = args or ["slim", "slimg"]

    pack, parsed = load_scene(scene_path)
    bs = jax.device_put(BrickSet.from_pack(pack))
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera),
                                     W, H))
    for spec in variants:
        parts = spec.split(":")
        tr = parts[0]
        sort_mode = parts[1] if len(parts) > 1 and parts[1] else "sig_mort"
        ct = int(parts[2][2:]) if len(parts) > 2 and parts[2] else 0
        tail = parts[3] if len(parts) > 3 else ""
        t0 = time.perf_counter()
        fn = lambda s0: render_samples_wavefront(bs, cd, W, H,
                                                 jnp.uint32(s0), SPF,
                                                 trace=tr,
                                                 sort_mode=sort_mode,
                                                 compact_tail=ct,
                                                 tail_trace=tail)
        first = float(np.asarray(fn(0)).mean())
        assert np.isfinite(first) and first > 0, (tr, first)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            acc = None
            for f in range(FRAMES):
                out = fn((f + 1) * SPF)
                acc = out if acc is None else acc + out
            float(np.asarray(acc).sum())
            best = min(best, time.perf_counter() - t0)
        ms = FRAMES * SPF * W * H / best / 1e6
        print(f"{spec:18s} {ms:6.3f} Msamples/s  ({best / FRAMES * 1e3:6.1f} "
              f"ms/frame, compile {compile_s:.0f}s, mean {first:.4f})",
              flush=True)


if __name__ == "__main__":
    main()
