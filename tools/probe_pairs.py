"""Attribution probe for the pair tracer (r4): pair counts from the
interval cull vs bricks the walk visits, and per-pair kernel cost on
coherent / scrambled waves."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BUNNY = "/root/reference/scenes/bunny/bunny.xml"
W, H = 640, 480


def sync(x):
    return float(np.asarray(x).sum())


def main():
    import jax
    import jax.numpy as jnp
    from pathtracer_cuda_interactive_tpu.models.bricks import BrickSet
    from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
    from pathtracer_cuda_interactive_tpu.ops.camera import (Camera,
                                                            camera_ray_data)
    from pathtracer_cuda_interactive_tpu.ops import pairtrace, wavefront
    from pathtracer_cuda_interactive_tpu.ops.pairtrace import (
        PACKET_ROWS, _interval_cull, trace_wave_pairs)
    from pathtracer_cuda_interactive_tpu.ops.vec import Vec3

    pack, parsed = load_scene(BUNNY)
    bs = jax.device_put(BrickSet.from_pack(pack))
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    B = bs.num_bricks
    print(f"bricks={B}")

    # primary wave rays (1 spp), the tile layout the renderer uses
    pix_slots, _ = wavefront._wave_layout(W, H)
    n = pix_slots.shape[0]
    rows = n // 128
    pix = jnp.asarray(pix_slots).reshape(rows, 128)
    u = ((pix % W).astype(jnp.float32) + 0.5) / W
    v = ((pix // W).astype(jnp.float32) + 0.5) / H
    org, dirn = wavefront.camera_rays(cd, u, v)
    act = jnp.where(pix < W * H, 1.0, 0.0)
    P = rows // PACKET_ROWS

    rng = np.random.default_rng(0)
    perm = rng.permutation(rows * 128)

    def scramble(a):
        return jnp.asarray(np.asarray(a).reshape(-1)[perm].reshape(rows, 128))

    for label, (o, d, a) in {
        "primary": ((org.x, org.y, org.z), (dirn.x, dirn.y, dirn.z), act),
        "scrambled": (tuple(scramble(c) for c in (org.x, org.y, org.z)),
                      tuple(scramble(c) for c in (dirn.x, dirn.y, dirn.z)),
                      scramble(act)),
    }.items():
        rp = lambda x: x.reshape(P, PACKET_ROWS * 128)
        lb = jax.jit(_interval_cull, static_argnames=("tnear",))(
            Vec3(*map(rp, o)), Vec3(*map(rp, d)), rp(a) > 0,
            jnp.asarray(bs.brick_lo), jnp.asarray(bs.brick_hi), 0.0)
        lbh = np.asarray(lb)
        pairs = np.isfinite(lbh).sum()
        print(f"[{label}] pairs={pairs} ({pairs / P:.1f}/packet, P={P})")

        f = jax.jit(lambda *args: trace_wave_pairs(
            bs.brick_data, jnp.asarray(bs.brick_lo),
            jnp.asarray(bs.brick_hi), 0.0, *args))
        t0 = time.perf_counter()
        t, slot = f(*o, *d, a)
        sync(t)
        print(f"[{label}] first (compile) {time.perf_counter() - t0:.1f} s")
        for _ in range(2):
            t0 = time.perf_counter()
            t, slot = f(*o, *d, a)
            sync(t)
            dt = time.perf_counter() - t0
            print(f"[{label}] trace {dt * 1e3:.1f} ms "
                  f"({dt / max(pairs, 1) * 1e6:.2f} us/pair, "
                  f"hit%={100 * float((np.asarray(slot) >= 0).mean()):.1f})")


if __name__ == "__main__":
    main()
