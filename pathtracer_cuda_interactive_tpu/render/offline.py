"""Offline render CLI — the ``./torrey SCENE_FILE.xml`` analog.

The reference CLI is exactly one positional scene argument
(main.cu:152-157); we add output/spp/resolution flags since there is no
window to show the result in.  Prints the same init-stage timing report the
reference prints (main.cu:174-201, 262-266).

Usage:
    python -m pathtracer_cuda_interactive_tpu.render.offline scene.xml \
        [-o out.png] [--spp N] [--width W --height H] [--checkpoint ck.npz]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="torrey-tpu")
    ap.add_argument("scene", help="Mitsuba-0.6 scene XML")
    ap.add_argument("-o", "--output", default=None, help="output PNG path")
    ap.add_argument("--spp", type=int, default=None,
                    help="samples per pixel (default: scene sampleCount)")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--batch", type=int, default=8,
                    help="samples per device dispatch")
    ap.add_argument("--checkpoint", default=None,
                    help="save accumulation checkpoint npz here")
    ap.add_argument("--resume", default=None,
                    help="resume from an accumulation checkpoint")
    ap.add_argument("--max-depth", type=int, default=None)
    ap.add_argument("--nee", action="store_true",
                    help="sample point lights with shadow rays (beyond-"
                         "reference capability; the reference never samples "
                         "its parsed point lights)")
    args = ap.parse_args(argv)

    from ..utils.config import RenderConfig, setup_jax
    setup_jax()

    from ..models.scenepack import load_scene
    from ..ops.camera import Camera
    from .renderer import ProgressiveRenderer

    t0 = time.time()
    pack, parsed = load_scene(args.scene)
    parse_s = time.time() - t0
    print(f"Scene parsing and construction done: took {parse_s:.4f} seconds.")
    print(f"BVH: {pack.num_nodes} nodes, depth {pack.bvh_depth}, "
          f"{pack.num_prims} primitives "
          f"({pack.num_spheres} spheres, {pack.num_triangles} triangles)")

    kw = {"enable_nee": args.nee}
    if args.max_depth:
        kw["max_depth"] = args.max_depth
    cfg = RenderConfig(**kw)
    renderer = ProgressiveRenderer(
        pack, Camera.from_parsed(parsed.camera),
        args.width or parsed.camera.width,
        args.height or parsed.camera.height, cfg)

    if args.resume:
        renderer.load_checkpoint(args.resume)
        print(f"Resumed at {renderer.sample_count} spp from {args.resume}")

    spp = args.spp or parsed.samples_per_pixel
    t0 = time.time()
    first = True
    while renderer.sample_count < spp:
        ns = min(args.batch, spp - renderer.sample_count)
        renderer.step(ns)
        if first:
            print(f"First frame (compile + {ns} spp): "
                  f"took {time.time() - t0:.4f} seconds.")
            first = False
    total_s = time.time() - t0
    n_rays = renderer.sample_count * renderer.width * renderer.height
    print(f"Rendered {renderer.sample_count} spp at "
          f"{renderer.width}x{renderer.height} in {total_s:.2f} s "
          f"({n_rays / max(total_s, 1e-9) / 1e6:.1f} Msamples/s)")

    out = args.output or os.path.splitext(os.path.basename(args.scene))[0] + ".png"
    renderer.save_png(out)
    print(f"Wrote {out}")
    if args.checkpoint:
        renderer.save_checkpoint(args.checkpoint)
        print(f"Wrote checkpoint {args.checkpoint}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
