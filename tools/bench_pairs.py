"""Measure bunny full-depth throughput: pair tracer vs slim walk (r4).

Usage: python tools/bench_pairs.py [trace:sort,trace:sort,...] [frames]
e.g.   python tools/bench_pairs.py pairs:sig_mort,slim:sig_mort 6
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BUNNY = "/root/reference/scenes/bunny/bunny.xml"
W, H, SPF = 640, 480, 2


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "pairs:sig_mort"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from pathtracer_cuda_interactive_tpu.utils.config import setup_jax
    setup_jax()
    import jax.numpy as jnp
    from pathtracer_cuda_interactive_tpu.models.bricks import BrickSet
    from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
    from pathtracer_cuda_interactive_tpu.ops.camera import (Camera,
                                                            camera_ray_data)
    from pathtracer_cuda_interactive_tpu.ops.wavefront import (
        render_samples_wavefront)
    import jax

    t0 = time.perf_counter()
    pack, parsed = load_scene(BUNNY)
    bs = jax.device_put(BrickSet.from_pack(pack))
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    print(f"init {time.perf_counter() - t0:.2f} s "
          f"(tris={pack.num_triangles}, bricks={bs.num_bricks})")

    for token in which.split(","):
        trace, _, sort_mode = token.partition(":")
        sort_mode = sort_mode or "sig_mort"
        fn = lambda s0: render_samples_wavefront(
            bs, cd, W, H, jnp.uint32(s0), SPF, trace=trace,
            sort_mode=sort_mode)
        t0 = time.perf_counter()
        first = float(np.asarray(fn(0)).mean())
        print(f"[{token}] first frame (compile+run) "
              f"{time.perf_counter() - t0:.1f} s, mean={first:.4f}")
        assert np.isfinite(first) and first > 0
        for p in range(2):
            t0 = time.perf_counter()
            acc = None
            for f in range(frames):
                out = fn((f + 1) * SPF)
                acc = out if acc is None else acc + out
            np.asarray(acc).sum()
            dt = time.perf_counter() - t0
            print(f"[{token}] pass {p}: {frames * SPF * W * H / dt / 1e6:.3f}"
                  f" Msamples/s ({dt / frames * 1e3:.1f} ms/frame)")


if __name__ == "__main__":
    main()
