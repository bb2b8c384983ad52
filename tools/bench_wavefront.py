"""Benchmark: sorted-wavefront vs persistent brick tracer on real TPU.

Usage: python tools/bench_wavefront.py [scene.xml] [spp] [depth]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_cuda_interactive_tpu.models.bricks import BrickSet
from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
from pathtracer_cuda_interactive_tpu.ops import brickkernel, wavefront
from pathtracer_cuda_interactive_tpu.ops.camera import Camera, camera_ray_data

SCENE = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/scenes/bunny/bunny.xml"
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 2
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 50
W, H = 640, 480
MODES = os.environ.get("MODES", "wavefront,bricks").split(",")


def bench(name, fn, reps=5):
    out = fn(0)
    out.block_until_ready()
    t0 = time.perf_counter()
    for k in range(reps):
        out = fn(k + 1)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    ms = W * H * SPP / dt / 1e6
    print(f"{name:12s}: {dt*1e3:8.2f} ms/frame  {ms:8.2f} Msamples/s")
    return ms


def main():
    pack, parsed = load_scene(SCENE)
    print(f"{SCENE}: {pack.num_triangles} tris, {pack.num_spheres} spheres")
    t0 = time.time()
    bs = jax.device_put(BrickSet.from_pack(pack))
    print(f"bricks: {bs.num_bricks} ({time.time()-t0:.1f}s)")
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))

    if "wavefront" in MODES:
        for sm in ("mort_oct", "none"):
            bench(f"wave/{sm}", lambda k, sm=sm: wavefront.render_samples_wavefront(
                bs, cd, W, H, jnp.uint32(k * SPP), SPP, max_depth=DEPTH,
                sort_mode=sm))
    if "bricks" in MODES:
        bench("persistent", lambda k: brickkernel.render_samples_bricks(
            bs, cd, W, H, jnp.uint32(k * SPP), SPP, max_depth=DEPTH))


if __name__ == "__main__":
    main()
