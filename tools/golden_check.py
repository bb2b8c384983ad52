"""Golden-image calibration + recording.

Two jobs (VERDICT r2 item 7):

1. **Calibrate** against the reference's shipped sample images
   (`/root/reference/sample_images/*.png`): render the same scenes at high
   spp on the real chip, print tile-mean deltas — the numbers
   tests/test_golden.py's tolerances are derived from.

2. **Record** this framework's own high-spp renders for scenes the
   reference shipped no image for (teapot, spheres area light), plus a
   seed-to-seed noise floor for every case.  Written to
   ``tests/goldens/<name>.png`` + ``tests/goldens/calibration.json``;
   tests/test_golden.py compares low-spp CPU renders against these with
   tolerances tied to the recorded noise floor, so a BRDF/emission/gamma
   regression fails even where no reference image exists.

Run on TPU:  python tools/golden_check.py [--record]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pathtracer_cuda_interactive_tpu.render.renderer import ProgressiveRenderer
from pathtracer_cuda_interactive_tpu.utils.config import RenderConfig
from pathtracer_cuda_interactive_tpu.utils.image import read_png_any, write_png

SCENES = "/root/reference/scenes"
SAMPLES = "/root/reference/sample_images"
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")

# name, scene xml, ref png (None = self-recorded only), W, H, spp
CASES = [
    ("cbox", "cbox/cbox.xml", "cbox.png", 128, 128, 256),
    ("bunny", "bunny/bunny.xml", "bunny.png", 160, 120, 64),
    ("scene1_phong", "spheres/scene1_spherical_light_phong.xml",
     "scene1_phong.png", 160, 120, 256),
    ("teapot", "teapot/teapot_constant.xml", None, 128, 96, 256),
    ("scene1_area", "spheres/scene1_spherical_light.xml", None,
     128, 96, 256),
]

GRID = (12, 16)  # tile grid (rows, cols)


def tiles(img, grid=GRID):
    h, w = img.shape[:2]
    gh, gw = grid
    th, tw = h // gh, w // gw
    img = img[:gh * th, :gw * tw].reshape(gh, th, gw, tw, 3)
    return img.mean(axis=(1, 3))


def render(xml, W, H, spp, seed=1984):
    # a single 8-spp step size for EVERY call keeps each case at ONE jit
    # variant (mixed 16/8 steps used to cost two multi-minute wavefront
    # compiles per case and blow the recording window)
    assert spp % 8 == 0, spp
    r = ProgressiveRenderer.from_xml(xml, width=W, height=H,
                                     config=RenderConfig(seed=seed))
    t0 = time.time()
    while r.sample_count < spp:
        r.step(8, sync=False)
    img = r.framebuffer().astype(np.float32) / 255.0  # forces the readback
    return img, r.mode, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true",
                    help="write tests/goldens/*.png + calibration.json")
    ap.add_argument("--cases", default=None,
                    help="comma-separated case names (default: all)")
    args = ap.parse_args()
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    only = set(args.cases.split(",")) if args.cases else None
    calib = {}
    if os.path.exists(os.path.join(GOLDEN_DIR, "calibration.json")):
        calib = json.load(open(os.path.join(GOLDEN_DIR, "calibration.json")))

    for name, xml, refpng, W, H, spp in CASES:
        if only and name not in only:
            continue
        ours, mode, dt = render(os.path.join(SCENES, xml), W, H, spp)
        entry = {"xml": xml, "W": W, "H": H, "spp": spp, "mode": mode,
                 "render_s": round(dt, 1)}

        # seed-to-seed noise floor at the TEST spp (24) — what the test's
        # tolerance must exceed
        a, _, _ = render(os.path.join(SCENES, xml), W, H, 24, seed=1984)
        b, _, _ = render(os.path.join(SCENES, xml), W, H, 24, seed=777)
        noise = float(np.abs(tiles(a) - tiles(b)).mean())
        noise_max = float(np.abs(tiles(a) - tiles(b)).max())
        entry["tile_noise_mean_24spp"] = round(noise, 5)
        entry["tile_noise_max_24spp"] = round(noise_max, 5)

        if refpng is not None:
            ref = read_png_any(os.path.join(SAMPLES, refpng))
            ref = ref.astype(np.float32) / 255.0
            rh, rw = ref.shape[:2]
            fh, fw = rh // H, rw // W
            ref = ref[:fh * H, :fw * W].reshape(H, fh, W, fw, 3).mean((1, 3))
            d = np.abs(tiles(ref) - tiles(ours))
            gd = np.abs(tiles(ref).mean((0, 1)) - tiles(ours).mean((0, 1)))
            entry["vs_reference"] = {
                "tile_mean_abs_d": round(float(d.mean()), 5),
                "tile_max_abs_d": round(float(d.max()), 5),
                "global_channel_d": [round(float(x), 5) for x in gd],
            }
        print(f"{name}: {json.dumps(entry)}", flush=True)

        if args.record:
            write_png(os.path.join(GOLDEN_DIR, f"{name}.png"),
                      (ours * 255.99).clip(0, 255).astype(np.uint8))
            calib[name] = entry

    if args.record:
        with open(os.path.join(GOLDEN_DIR, "calibration.json"), "w") as f:
            json.dump(calib, f, indent=1, sort_keys=True)
        print(f"recorded -> {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
