"""cbox megakernel attribution (r4, VERDICT #2): pipelined throughput,
synced latency, dispatch floor, and a BLOCK_ROWS sweep.

Usage: python tools/bench_cbox.py [rows,rows,...]   (default 64)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CBOX = "/root/reference/scenes/cbox/cbox.xml"
W, H, SPF = 640, 480, 2


def main():
    rows_list = [int(r) for r in
                 (sys.argv[1].split(",") if len(sys.argv) > 1 else ["64"])]
    from pathtracer_cuda_interactive_tpu.utils.config import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from pathtracer_cuda_interactive_tpu.models.device_scene import (
        DeviceScene)
    from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
    from pathtracer_cuda_interactive_tpu.ops import megakernel as mk
    from pathtracer_cuda_interactive_tpu.ops.camera import (Camera,
                                                            camera_ray_data)

    # dispatch floor: a trivial donated add, timed with the same 4-byte
    # dependent readback the renderer uses
    x = jnp.zeros((H, W, 3), jnp.float32)
    triv = jax.jit(lambda a: a + 1.0, donate_argnums=0)
    x = triv(x)
    float(np.asarray(x[:1, :1, :1]).sum())
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        x = triv(x)
        float(np.asarray(x[:1, :1, :1]).sum())
        lats.append(time.perf_counter() - t0)
    print(f"dispatch+sync floor: median {np.median(lats) * 1e3:.2f} ms "
          f"(min {min(lats) * 1e3:.2f})")

    pack, parsed = load_scene(CBOX)
    ds = jax.device_put(DeviceScene.from_pack(pack))
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera),
                                     W, H))

    for rows in rows_list:
        mk.BLOCK_ROWS = rows
        fn = jax.jit(lambda s0: mk.render_samples_pallas(
            ds, cd, W, H, s0, SPF))
        t0 = time.perf_counter()
        first = float(np.asarray(fn(jnp.uint32(0))).mean())
        assert np.isfinite(first) and first > 0
        print(f"[rows={rows}] compile+first {time.perf_counter() - t0:.1f}s")
        # pipelined throughput (30 frames, best of 2)
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            acc = None
            for f in range(30):
                out = fn(jnp.uint32((f + 1) * SPF))
                acc = out if acc is None else acc + out
            np.asarray(acc).sum()
            best = min(best, time.perf_counter() - t0)
        print(f"[rows={rows}] pipelined {30 * SPF * W * H / best / 1e6:.2f} "
              f"Msamples/s ({best / 30 * 1e3:.2f} ms/frame)")
        # synced per-frame latency
        lat = []
        acc = fn(jnp.uint32(0))
        for f in range(12):
            t0 = time.perf_counter()
            out = fn(jnp.uint32((f + 7) * SPF))
            float(np.asarray(out[:1, :1, :1]).sum())
            lat.append(time.perf_counter() - t0)
        med = float(np.median(lat))
        print(f"[rows={rows}] synced {med * 1e3:.2f} ms/frame "
              f"({1.0 / med:.1f} FPS)")


if __name__ == "__main__":
    main()
