"""Ground-truth incidence census (r4): per-ray EXACT line-vs-AABB hits
against bricks and chunks, per wave, for the real bunny frame.  This is
the work a perfectly ray-exact binning tracer would do — the lower bound
that packet-granularity designs waste against."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

BUNNY = "/root/reference/scenes/bunny/bunny.xml"
W, H = 640, 480
DEPTHS = 5


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from pathtracer_cuda_interactive_tpu.models.bricks import (
        BRICK_DATA_ROWS, BrickSet)
    from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
    from pathtracer_cuda_interactive_tpu.ops import rng, wavefront
    from pathtracer_cuda_interactive_tpu.ops.camera import (Camera,
                                                            camera_ray_data)
    from pathtracer_cuda_interactive_tpu.ops.vec import Vec3
    from pathtracer_cuda_interactive_tpu.ops.wavefront import (
        SECONDARY_TNEAR, _record_from_slots, _shade, _trace_wave_slim,
        _wave_layout)

    pack, parsed = load_scene(BUNNY)
    bs = jax.device_put(BrickSet.from_pack(pack))
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    B = bs.num_bricks
    S = bs.num_spheres
    print(f"bricks={B}")

    pix_slots, _ = _wave_layout(W, H)
    rows = pix_slots.shape[0] // 128
    shape = (rows, 128)
    pix = jnp.asarray(pix_slots).reshape(shape)
    R = W * H

    sub = np.asarray(bs.sub_boxes).reshape(B * 16, 8)
    # pack chunk boxes brick-major so a fori over bricks tests its 16
    sub_lo = jnp.asarray(sub[:, 0:3]).reshape(B, 16, 3)
    sub_hi = jnp.asarray(sub[:, 3:6]).reshape(B, 16, 3)
    sub_ok = jnp.asarray(sub[:, 6] > 0).reshape(B, 16)
    blo = jnp.asarray(bs.brick_lo)
    bhi = jnp.asarray(bs.brick_hi)

    @jax.jit
    def incidence(org_x, org_y, org_z, dx, dy, dz, act, tmax):
        """Per-ray exact counts: (brick hits, chunk hits) vs the segment
        (0/eps, tmax]."""
        org = Vec3(org_x, org_y, org_z)
        inv = Vec3(1.0 / dx, 1.0 / dy, 1.0 / dz)
        active = act > 0.0

        def slab(lo3, hi3, tmax):
            tx0 = (lo3[0] - org.x) * inv.x
            tx1 = (hi3[0] - org.x) * inv.x
            ty0 = (lo3[1] - org.y) * inv.y
            ty1 = (hi3[1] - org.y) * inv.y
            tz0 = (lo3[2] - org.z) * inv.z
            tz1 = (hi3[2] - org.z) * inv.z
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                         jnp.maximum(ty0, ty1)),
                             jnp.maximum(tz0, tz1))
            return (tf >= jnp.maximum(tn, 0.0)) & (tn <= tmax) & active

        def body(b, st):
            cb, cc = st
            hitb = slab((blo[b, 0], blo[b, 1], blo[b, 2]),
                        (bhi[b, 0], bhi[b, 1], bhi[b, 2]), tmax)
            cb = cb + hitb.astype(jnp.int32)

            def chunk_body(s, cc):
                hitc = slab((sub_lo[b, s, 0], sub_lo[b, s, 1],
                             sub_lo[b, s, 2]),
                            (sub_hi[b, s, 0], sub_hi[b, s, 1],
                             sub_hi[b, s, 2]), tmax) & sub_ok[b, s]
                return cc + hitc.astype(jnp.int32)

            cc = lax.cond(jnp.any(hitb),
                          lambda c: lax.fori_loop(0, 16, chunk_body, c),
                          lambda c: c, cc)
            return cb, cc

        z = jnp.zeros(shape, jnp.int32)
        cb, cc = lax.fori_loop(0, B, body, (z, z))
        return cb, cc

    tri_rows = jnp.asarray(bs.brick_data)[:, :BRICK_DATA_ROWS, :].reshape(
        -1, 32)
    bg3 = Vec3(jnp.float32(bs.bg_r), jnp.float32(bs.bg_g),
               jnp.float32(bs.bg_b))

    @jax.jit
    def start_wave():
        state = rng.seed_rays(pix.astype(jnp.uint32),
                              jnp.zeros(shape, jnp.uint32), 1984)
        state, u1 = rng.next_uniform(state)
        state, u2 = rng.next_uniform(state)
        i = (pix % W).astype(jnp.float32)
        j = (pix // W).astype(jnp.float32)
        org, dirn = wavefront.camera_rays(cd, (i + u1) / W, (j + u2) / H)
        return org, dirn, pix < R, state

    def step(org, dirn, T, L, active, state, depth, tnear):
        act_f = jnp.where(active, 1.0, 0.0)
        t, slot = _trace_wave_slim(
            bs.sph_rows, bs.top_boxes, bs.top_links, bs.brick_data, tnear,
            org.x, org.y, org.z, dirn.x, dirn.y, dirn.z, act_f, S)
        rec = _record_from_slots(tri_rows, bs.sph_rows, S, t, slot, org,
                                 dirn, tnear, active)
        return t, _shade(rec, org, dirn, T, L, active, state,
                         jnp.int32(depth), bg3, 5, 50)

    org, dirn, active, state = start_wave()
    T = Vec3.full(shape, (1.0, 1.0, 1.0))
    L = Vec3.zeros(shape)
    for depth in range(DEPTHS):
        tnear = 0.0 if depth == 0 else SECONDARY_TNEAR
        live = int(np.asarray(active).sum())
        if live == 0:
            break
        # exact incidences without t-termination (inf) and with the true
        # first-hit t (the early-termination floor)
        t, nxt = step(org, dirn, T, L, active, state, depth, tnear)
        act_f = jnp.where(active, 1.0, 0.0)
        cb_inf, cc_inf = incidence(org.x, org.y, org.z, dirn.x, dirn.y,
                                   dirn.z, act_f, jnp.inf)
        cb_t, cc_t = incidence(org.x, org.y, org.z, dirn.x, dirn.y,
                               dirn.z, act_f, t)
        sb, sc = int(np.asarray(cb_inf).sum()), int(np.asarray(cc_inf).sum())
        sbt, sct = int(np.asarray(cb_t).sum()), int(np.asarray(cc_t).sum())
        print(f"wave {depth}: live={live} "
              f"brick_inc={sb} ({sb / max(live, 1):.2f}/ray) "
              f"chunk_inc={sc} ({sc / max(live, 1):.2f}/ray) | "
              f"with-first-hit-t: brick={sbt} ({sbt / max(live, 1):.2f}) "
              f"chunk={sct} ({sct / max(live, 1):.2f})")
        org, dirn, T, L, active, state = nxt


if __name__ == "__main__":
    main()
