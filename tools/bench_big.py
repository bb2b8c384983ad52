"""Buddha-scale benchmark on real TPU (VERDICT r2 item 3).

The reference renders buddha (1,087,474 tris) at 40 FPS / 640x480x2spp
(/root/reference/README.md:130-133), but the buddha/dragon PLY blobs are
stripped from the mirror.  Capability surrogate: the bunny scene with one
level of 1:4 midpoint subdivision (models/subdivide.py) = 1,152,370
triangles, same shading.  Renders through the chosen large-scene path at
the reference's interactive config and prints one JSON line with build
time + Msamples/s (chained-readback timing; block_until_ready lies on
this platform).

Run:  python tools/bench_big.py [--mode mx2] [--frames 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathtracer_cuda_interactive_tpu.utils.config import setup_jax  # noqa
setup_jax()

BUNNY = "/root/reference/scenes/bunny/bunny.xml"
W, H, SPF = 640, 480, 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="mx2",
                    choices=["mx2", "wavefront", "mx"])
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--max-depth", type=int, default=50)
    ap.add_argument("--levels", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pathtracer_cuda_interactive_tpu.models.scenepack import (load_scene,
                                                                  pack_scene)
    from pathtracer_cuda_interactive_tpu.models.subdivide import (
        subdivide_scene)
    from pathtracer_cuda_interactive_tpu.ops.camera import (Camera,
                                                            camera_ray_data)

    t0 = time.perf_counter()
    _, parsed = load_scene(BUNNY)
    parsed = subdivide_scene(parsed, levels=args.levels)
    pack = pack_scene(parsed)
    parse_s = time.perf_counter() - t0
    tris = int(pack.num_triangles)

    cam = Camera.from_parsed(parsed.camera)
    cd = jnp.asarray(camera_ray_data(cam, W, H))

    t0 = time.perf_counter()
    if args.mode == "mx2":
        from pathtracer_cuda_interactive_tpu.experiments.mx2set import MX2Set
        from pathtracer_cuda_interactive_tpu.experiments.mx2 import render_samples_mx2
        scene = jax.device_put(MX2Set.from_pack(pack))
        fn = lambda s0: render_samples_mx2(scene, cd, W, H, jnp.uint32(s0),
                                           SPF, max_depth=args.max_depth)
    elif args.mode == "mx":
        from pathtracer_cuda_interactive_tpu.experiments.mxset import MXSet
        from pathtracer_cuda_interactive_tpu.experiments.mxtrace import (
            render_samples_mx)
        scene = jax.device_put(MXSet.from_pack(pack))
        fn = lambda s0: render_samples_mx(scene, cd, W, H, jnp.uint32(s0),
                                          SPF, max_depth=args.max_depth)
    else:
        from pathtracer_cuda_interactive_tpu.models.bricks import BrickSet
        from pathtracer_cuda_interactive_tpu.ops.wavefront import (
            render_samples_wavefront)
        scene = jax.device_put(BrickSet.from_pack(pack))
        fn = lambda s0: render_samples_wavefront(
            scene, cd, W, H, jnp.uint32(s0), SPF, max_depth=args.max_depth)
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    img = fn(0)
    mean = float(np.asarray(img).mean())
    first_s = time.perf_counter() - t0
    assert np.isfinite(mean) and mean > 0

    best = float("inf")
    for p in range(2):
        t0 = time.perf_counter()
        acc = None
        for f in range(args.frames):
            out = fn((p * args.frames + f + 1) * SPF)
            acc = out if acc is None else acc + out
        np.asarray(acc).sum()
        best = min(best, time.perf_counter() - t0)
    msamp = args.frames * SPF * W * H / best / 1e6

    print(json.dumps({
        "scene": "bunny_subdiv", "tris": tris, "mode": args.mode,
        "parse_s": round(parse_s, 2), "build_s": round(build_s, 2),
        "first_frame_s": round(first_s, 2),
        "msamples_s": round(msamp, 3),
        "ref_buddha_msamples_s": 24.6,   # 40 FPS x 640x480x2 (README:130)
        "mean": round(mean, 5)}))


if __name__ == "__main__":
    main()
