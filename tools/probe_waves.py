"""Per-wave coherence census for the real bunny frame (r4).

Reproduces the sorted-wavefront bounce loop outside the fused while_loop
and, at every wave, reports live rays plus pair counts from the interval
cull at several packet sizes — brick-level and chunk-level — so the pair
kernel's cost model can be evaluated against REAL secondary waves rather
than the scrambled worst case.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BUNNY = "/root/reference/scenes/bunny/bunny.xml"
W, H = 640, 480
DEPTHS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from pathtracer_cuda_interactive_tpu.models.bricks import BrickSet
    from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
    from pathtracer_cuda_interactive_tpu.ops import rng, wavefront
    from pathtracer_cuda_interactive_tpu.ops.camera import (Camera,
                                                            camera_ray_data)
    from pathtracer_cuda_interactive_tpu.ops.pairtrace import _interval_cull
    from pathtracer_cuda_interactive_tpu.ops.vec import Vec3
    from pathtracer_cuda_interactive_tpu.ops.wavefront import (
        SECONDARY_TNEAR, _record_from_slots, _shade, _sort_key,
        _trace_wave_slim, _wave_layout)
    from pathtracer_cuda_interactive_tpu.models.bricks import (
        BRICK_DATA_ROWS)

    pack, parsed = load_scene(BUNNY)
    bs = jax.device_put(BrickSet.from_pack(pack))
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    B = bs.num_bricks
    S = bs.num_spheres
    print(f"bricks={B}")

    pix_slots, _ = _wave_layout(W, H)
    n = pix_slots.shape[0]
    rows = n // 128
    shape = (rows, 128)
    pix = jnp.asarray(pix_slots).reshape(shape)
    R = W * H

    # chunk boxes as flat [B*16] tables + validity
    sub = np.asarray(bs.sub_boxes).reshape(B * 16, 8)
    sub_lo = jnp.asarray(sub[:, 0:3])
    sub_hi = jnp.asarray(sub[:, 3:6])
    sub_ok = jnp.asarray(sub[:, 6] > 0)

    @jax.jit
    def start_wave():
        state = rng.seed_rays(pix.astype(jnp.uint32),
                              jnp.zeros(shape, jnp.uint32), 1984)
        state, u1 = rng.next_uniform(state)
        state, u2 = rng.next_uniform(state)
        i = (pix % W).astype(jnp.float32)
        j = (pix // W).astype(jnp.float32)
        org, dirn = wavefront.camera_rays(cd, (i + u1) / W, (j + u2) / H)
        active = pix < R
        return org, dirn, active, state

    tri_rows = jnp.asarray(bs.brick_data)[:, :BRICK_DATA_ROWS, :].reshape(
        -1, 32)
    bg3 = Vec3(jnp.float32(bs.bg_r), jnp.float32(bs.bg_g),
               jnp.float32(bs.bg_b))
    root = np.asarray(bs.top_boxes)[0, :6]
    lo, hi = root[:3], root[3:]
    inv = 1.0 / np.maximum(hi - lo, 1e-12)

    def step(org, dirn, T, L, active, state, depth, tnear):
        act_f = jnp.where(active, 1.0, 0.0)
        t, slot = _trace_wave_slim(
            bs.sph_rows, bs.top_boxes, bs.top_links, bs.brick_data, tnear,
            org.x, org.y, org.z, dirn.x, dirn.y, dirn.z, act_f, S)
        rec = _record_from_slots(tri_rows, bs.sph_rows, S, t, slot, org,
                                 dirn, tnear, active)
        return _shade(rec, org, dirn, T, L, active, state,
                      jnp.int32(depth), bg3, 5, 50)

    @jax.jit
    def sort_wave(org, dirn, T, L, active, state):
        key = _sort_key(org, dirn, active, jnp.asarray(lo), jnp.asarray(inv))
        flat = lambda a: a.reshape(-1)
        cols = lax.sort(
            (flat(key), flat(org.x), flat(org.y), flat(org.z),
             flat(dirn.x), flat(dirn.y), flat(dirn.z), flat(T.x), flat(T.y),
             flat(T.z), flat(L.x), flat(L.y), flat(L.z), flat(state),
             flat(jnp.where(active, 1.0, 0.0))), num_keys=1)
        (ox, oy, oz, dx, dy, dz, Tx, Ty, Tz, Lx, Ly, Lz, st,
         af) = (c.reshape(shape) for c in cols[1:])
        return (Vec3(ox, oy, oz), Vec3(dx, dy, dz), Vec3(Tx, Ty, Tz),
                Vec3(Lx, Ly, Lz), af > 0.0, st)

    from pathtracer_cuda_interactive_tpu.ops.wavefront import _spread3

    def _key_variant(org, dirn, active, mode):
        def q(c, l, s, bits):
            x = jnp.clip((c - l) * s * (2.0 ** bits - 1), 0.0,
                         2.0 ** bits - 1)
            return x.astype(jnp.int32)

        octant = ((dirn.x > 0).astype(jnp.int32) * 4
                  + (dirn.y > 0).astype(jnp.int32) * 2
                  + (dirn.z > 0).astype(jnp.int32))
        if mode == "oct_major":
            mx = _spread3(q(org.x, lo[0], inv[0], 7))
            my = _spread3(q(org.y, lo[1], inv[1], 7))
            mz = _spread3(q(org.z, lo[2], inv[2], 7))
            morton = (mx << 2) | (my << 1) | mz
            key = (octant << 21) | morton
        else:
            mx = _spread3(q(org.x, lo[0], inv[0], 7))
            my = _spread3(q(org.y, lo[1], inv[1], 7))
            mz = _spread3(q(org.z, lo[2], inv[2], 7))
            morton = (mx << 2) | (my << 1) | mz
            key = (morton << 3) | octant
        return jnp.where(active, key, jnp.int32(np.iinfo(np.int32).max))

    @jax.jit
    def resort(org, dirn, active, mode_key):
        flat = lambda a: a.reshape(-1)
        cols = lax.sort(
            (flat(mode_key), flat(org.x), flat(org.y), flat(org.z),
             flat(dirn.x), flat(dirn.y), flat(dirn.z),
             flat(jnp.where(active, 1.0, 0.0))), num_keys=1)
        (ox, oy, oz, dx, dy, dz, af) = (c.reshape(shape) for c in cols[1:])
        return Vec3(ox, oy, oz), Vec3(dx, dy, dz), af > 0.0

    def census(org, dirn, active, label):
        for mode in ("cur", "oct_major"):
            if mode != "cur":
                k = _key_variant(org, dirn, active, mode)
                o2, d2, a2 = resort(org, dirn, active, k)
            else:
                o2, d2, a2 = org, dirn, active
            for pr in (8, 16, 32):
                P = rows // pr
                rp = lambda a: a.reshape(P, pr * 128)
                o = Vec3(rp(o2.x), rp(o2.y), rp(o2.z))
                d = Vec3(rp(d2.x), rp(d2.y), rp(d2.z))
                a = rp(jnp.where(a2, 1.0, 0.0)) > 0
                f = jax.jit(_interval_cull, static_argnames=("tnear",))
                lbb = f(o, d, a, jnp.asarray(bs.brick_lo),
                        jnp.asarray(bs.brick_hi), 0.0)
                bp = int(np.isfinite(np.asarray(lbb)).sum())
                lbc = f(o, d, a, sub_lo, sub_hi, 0.0)
                lbc = jnp.where(sub_ok[None, :], lbc, jnp.inf)
                cp = int(np.isfinite(np.asarray(lbc)).sum())
                print(f"  [{label}][{mode:9s}] pr={pr:2d} P={P:4d} "
                      f"brick_pairs={bp:7d} ({bp / P:6.1f}/pkt) "
                      f"chunk_pairs={cp:8d} ({cp / P:7.1f}/pkt)")

    org, dirn, active, state = start_wave()
    T = Vec3.full(shape, (1.0, 1.0, 1.0))
    L = Vec3.zeros(shape)
    print(f"wave 0: live={int(np.asarray(active).sum())}")
    census(org, dirn, active, "wave0")
    org, dirn, T, L, active, state = step(org, dirn, T, L, active, state,
                                          0, 0.0)
    for depth in range(1, DEPTHS):
        org, dirn, T, L, active, state = sort_wave(org, dirn, T, L,
                                                   active, state)
        live = int(np.asarray(active).sum())
        print(f"wave {depth}: live={live}")
        if live == 0:
            break
        census(org, dirn, active, f"wave{depth}")
        org, dirn, T, L, active, state = step(org, dirn, T, L, active,
                                              state, depth, SECONDARY_TNEAR)


if __name__ == "__main__":
    main()
