"""Experiment: render scenes and compare tile means vs the reference's
shipped sample images (screenshots).  Prints per-scene stats to calibrate
tolerances for tests/test_golden.py."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from pathtracer_cuda_interactive_tpu.render.renderer import ProgressiveRenderer
from pathtracer_cuda_interactive_tpu.utils.image import read_png_any, write_png

CASES = [
    ("/root/reference/scenes/cbox/cbox.xml",
     "/root/reference/sample_images/cbox.png", 128, 128, 256),
    ("/root/reference/scenes/bunny/bunny.xml",
     "/root/reference/sample_images/bunny.png", 160, 120, 64),
    ("/root/reference/scenes/spheres/scene1_spherical_light_phong.xml",
     "/root/reference/sample_images/scene1_phong.png", 160, 120, 256),
]

GRID = (12, 16)  # tile grid (rows, cols)


def tiles(img, grid):
    h, w = img.shape[:2]
    gh, gw = grid
    th, tw = h // gh, w // gw
    img = img[:gh * th, :gw * tw].reshape(gh, th, gw, tw, 3)
    return img.mean(axis=(1, 3))


def main():
    for xml, png, W, H, spp in CASES:
        ref = read_png_any(png).astype(np.float32) / 255.0
        r = ProgressiveRenderer.from_xml(xml, width=W, height=H)
        import time; t0=time.time()
        while r.sample_count < spp:
            r.step(min(16, spp - r.sample_count), sync=False)
        ours = r.framebuffer().astype(np.float32) / 255.0
        name = os.path.basename(png)
        write_png(f"/tmp/golden_{name}", (ours * 255).astype(np.uint8))
        tr, to = tiles(ref, GRID), tiles(ours, GRID)
        d = np.abs(tr - to)
        print(f"{name}: render {time.time()-t0:.1f}s mode={r.mode} "
              f"mean|dt|={d.mean():.4f} max|dt|={d.max():.4f} "
              f"global d={np.abs(tr.mean(axis=(0,1))-to.mean(axis=(0,1)))}")


if __name__ == "__main__":
    main()
