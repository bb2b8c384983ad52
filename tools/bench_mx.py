"""Head-to-head on real TPU: MX (Plucker-matmul) tracer vs sorted wavefront.

VERDICT r2 item 1: the MX tracer shipped with CPU parity tests only.  This
tool times both large-scene paths on the bunny (144k tris) at the
reference's interactive config (640x480, 2 spp) and prints a small JSON
report.  Run on the real chip:  python tools/bench_mx.py [--scene bunny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathtracer_cuda_interactive_tpu.utils.config import setup_jax  # noqa: E402
setup_jax()

SCENES = {
    "bunny": "/root/reference/scenes/bunny/bunny.xml",
    "cbox": "/root/reference/scenes/cbox/cbox.xml",
    "teapot": "/root/reference/scenes/teapot/teapot.xml",
}
W, H, SPF = 640, 480, 2


def time_mode(pack, cam, mode, frames=4, max_depth=50, **kw):
    import jax.numpy as jnp
    from pathtracer_cuda_interactive_tpu.models.bricks import BrickSet
    from pathtracer_cuda_interactive_tpu.experiments.mx2set import MX2Set
    from pathtracer_cuda_interactive_tpu.experiments.mxset import MXSet
    from pathtracer_cuda_interactive_tpu.ops.camera import camera_ray_data
    from pathtracer_cuda_interactive_tpu.experiments.mx2 import render_samples_mx2
    from pathtracer_cuda_interactive_tpu.experiments.mxtrace import render_samples_mx
    from pathtracer_cuda_interactive_tpu.ops.wavefront import (
        render_samples_wavefront)
    import jax

    cd = jnp.asarray(camera_ray_data(cam, W, H))
    t0 = time.perf_counter()
    if mode == "mx2":
        scene = jax.device_put(MX2Set.from_pack(pack))
        fn = lambda s0: render_samples_mx2(scene, cd, W, H, jnp.uint32(s0),
                                           SPF, max_depth=max_depth, **kw)
    elif mode == "mx":
        scene = jax.device_put(MXSet.from_pack(pack))
        fn = lambda s0: render_samples_mx(scene, cd, W, H, jnp.uint32(s0),
                                          SPF, max_depth=max_depth, **kw)
    else:
        scene = jax.device_put(BrickSet.from_pack(pack))
        fn = lambda s0: render_samples_wavefront(scene, cd, W, H,
                                                 jnp.uint32(s0), SPF,
                                                 max_depth=max_depth, **kw)
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    img = fn(0)
    img.block_until_ready()
    first_s = time.perf_counter() - t0

    best = float("inf")
    for p in range(2):
        t0 = time.perf_counter()
        acc = None
        for f in range(frames):
            out = fn((p * frames + f + 1) * SPF)
            acc = out if acc is None else acc + out
        acc.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    msamp = frames * SPF * W * H / best / 1e6
    return {"mode": mode, "build_s": round(build_s, 2),
            "first_frame_s": round(first_s, 2),
            "msamples_s": round(msamp, 3),
            "mean": round(float(np.asarray(img).mean()), 5)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="bunny", choices=SCENES)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--max-depth", type=int, default=50)
    ap.add_argument("--modes", default="wavefront,mx2")
    args = ap.parse_args()

    from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
    from pathtracer_cuda_interactive_tpu.ops.camera import Camera

    pack, parsed = load_scene(SCENES[args.scene])
    cam = Camera.from_parsed(parsed.camera)
    report = {"scene": args.scene, "tris": int(pack.num_triangles)}
    for mode in args.modes.split(","):
        try:
            report[mode] = time_mode(pack, cam, mode, frames=args.frames,
                                     max_depth=args.max_depth)
        except Exception as e:  # keep the other mode's number
            report[mode] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(report[mode]), flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
