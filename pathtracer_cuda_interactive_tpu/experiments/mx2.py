"""Pallas MXU superbrick tracer — the second-generation large-scene path.

One grid step = one 128-ray packet.  Per packet the kernel walks its
near-ordered superbrick list (computed by the XLA-side interval cull, the
same one ops/mxtrace.py uses) with double-buffered slab DMA, culls at
32-triangle sub-brick granularity with scalar-box slab tests, and
intersects each surviving sub with ONE MXU pass:

    dot(C [16,128], F [16,128], contract sublanes) -> [128, 128]
    rows = [det(32) | u*det(32) | v*det(32) | t*det(32)], cols = rays

(models/mx2set.py stores C transposed — features on sublanes — so there
are no transposes anywhere in the kernel.)  A sign-corrected validity
epilogue + sublane min-reduction update the packet's per-ray closest hit
(t, slot); u/v and all shading attributes are recovered afterwards in XLA
from the winning slot, so the kernel streams only two [1,128] outputs.

Why this beats both round-2 large-scene paths:
  * vs ops/wavefront.py (VPU brick walk): the traversal union is paid at
    128-ray granularity instead of 2048 — the measured 36x chunk-test
    inflation (tools/kernel_stats.py) shrinks with packet size — and the
    per-triangle work runs on the MXU, not the VPU.
  * vs ops/mxtrace.py (XLA rounds): no [M,P,4T] HBM intermediates (the
    ADVICE r2 OOM), per-packet loop depth instead of global rounds, and
    per-packet early-out (stop when every live ray's best t is at or
    below the next brick's conservative entry bound).

Early-out invariant: a visit r+1 is prefetched (and its DMA started) iff
the pre-update best-t says some ray still needs it; the while cond is
simply "was the next visit prefetched", so the loop can never exit with a
DMA in flight.  Processing the occasional superfluous visit (best-t
tightened during visit r) is a no-op through the tt < best_t check.

Semantics: radiance.cuh:21-79 via wavefront._shade; intersection
shape.cuh:188-215 via the Plucker identities (models/mxset.py docstring).
Parity vs the XLA oracle: tests/test_mx2.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mx2set import MX2Set, NUM_SUBS, SB_PRIMS, SLAB_ROWS, SUB_PRIMS
from ..ops import rng
from ..ops.geometry import intersect_sphere
from ..ops.integrator import LANES, MAX_DEPTH, RR_START_DEPTH, SECONDARY_TNEAR
from .mxtrace import _interval_cull
from ..ops.vec import Vec3, cross, dot, where
from ..ops.wavefront import (MAX_RAYS_PER_WAVE, _nee_term, _shade, _sort_key,
                        _wave_layout, camera_rays)

INF = float("inf")


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

PACKETS_PER_BLOCK = 8     # Mosaic block shapes need sublane multiples of 8


def _make_mx2_kernel(Mblocks: int, Bpad: int):
    PK = PACKETS_PER_BLOCK

    def kernel(tn_ref, shift_ref, ox, oy, oz, dx, dy, dz, act,
               order_hbm, slb_hbm, subbox_hbm, coeff_hbm,
               out_t, out_slot,
               coeff_buf, subbox_buf, order_s, slb_s,
               sem_coeff, sem_sub, sem_ord, sem_slb):
        i = pl.program_id(0)
        par = lax.rem(i, 2)

        # --- 8 packets' visit lists: double-buffered across grid steps ---
        def start_list(slot, blk):
            pltpu.make_async_copy(order_hbm.at[pl.ds(blk * PK, PK)],
                                  order_s.at[slot],
                                  sem_ord.at[slot]).start()
            pltpu.make_async_copy(slb_hbm.at[pl.ds(blk * PK, PK)],
                                  slb_s.at[slot],
                                  sem_slb.at[slot]).start()

        @pl.when(i == 0)
        def _():
            start_list(0, i)

        pltpu.make_async_copy(order_hbm.at[pl.ds(0, PK)], order_s.at[par],
                              sem_ord.at[par]).wait()
        pltpu.make_async_copy(slb_hbm.at[pl.ds(0, PK)], slb_s.at[par],
                              sem_slb.at[par]).wait()

        @pl.when(i + 1 < Mblocks)
        def _():
            start_list(1 - par, i + 1)

        tnear = tn_ref[0, 0]
        sx, sy, sz = shift_ref[0, 0], shift_ref[0, 1], shift_ref[0, 2]

        def start_brick(buf, b):
            pltpu.make_async_copy(coeff_hbm.at[b],
                                  coeff_buf.at[pl.ds(buf * SLAB_ROWS,
                                                     SLAB_ROWS), :],
                                  sem_coeff.at[buf]).start()
            pltpu.make_async_copy(subbox_hbm.at[b], subbox_buf.at[buf],
                                  sem_sub.at[buf]).start()

        def sub_pass(s, b, buf, bt, bs, org, dirn, inv, actv, feats):
            """One sub-brick: scalar-box cull, then the MXU pass."""
            base = s * 8
            bmnx = subbox_buf[buf, base]
            bmny = subbox_buf[buf, base + 1]
            bmnz = subbox_buf[buf, base + 2]
            bmxx = subbox_buf[buf, base + 3]
            bmxy = subbox_buf[buf, base + 4]
            bmxz = subbox_buf[buf, base + 5]
            vld = subbox_buf[buf, base + 6] > 0.0

            tx0 = (bmnx - org.x) * inv.x
            tx1 = (bmxx - org.x) * inv.x
            ty0 = (bmny - org.y) * inv.y
            ty1 = (bmxy - org.y) * inv.y
            tz0 = (bmnz - org.z) * inv.z
            tz1 = (bmxz - org.z) * inv.z
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                         jnp.maximum(ty0, ty1)),
                             jnp.maximum(tz0, tz1))
            hitm = (tf >= jnp.maximum(tn, 0.0)) & (tn <= bt) & actv
            anyhit = jnp.any(hitm) & vld

            def do(carry):
                bt, bs = carry
                C = coeff_buf[pl.ds(buf * SLAB_ROWS + s * 16, 16), :]
                out = lax.dot_general(
                    C, feats, (((0,), (0,)), ((), ())),
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)       # [128,128]
                det = out[0 * SUB_PRIMS:1 * SUB_PRIMS]
                U = out[1 * SUB_PRIMS:2 * SUB_PRIMS]
                V = out[2 * SUB_PRIMS:3 * SUB_PRIMS]
                Tt = out[3 * SUB_PRIMS:4 * SUB_PRIMS]
                sg = jnp.sign(det)
                su, sv, sd = U * sg, V * sg, det * sg
                tt = Tt / jnp.where(det == 0.0, 1.0, det)
                valid = ((det != 0.0) & (su >= 0.0) & (sv >= 0.0)
                         & (su + sv <= sd) & (tt > tnear) & (tt < bt)
                         & actv)
                tv = jnp.where(valid, tt, INF)
                tmin = jnp.min(tv, axis=0, keepdims=True)     # [1,128]
                better = tmin < bt
                # Mosaic's tpu.iota only yields integer vectors; build the
                # f32 row index by converting
                io = lax.broadcasted_iota(
                    jnp.int32, tv.shape, 0).astype(jnp.float32)
                jsel = jnp.min(jnp.where(tv == tmin, io, INF), axis=0,
                               keepdims=True)
                slot = (b * SB_PRIMS + s * SUB_PRIMS
                        + jnp.where(better, jsel, 0.0).astype(jnp.int32))
                return (jnp.where(better, tmin, bt),
                        jnp.where(better, slot, bs))

            return lax.cond(anyhit, do, lambda c: c, (bt, bs))

        # --- the 8 packets of this block, sequentially ------------------
        for p in range(PK):
            org = Vec3(ox[p:p + 1, :], oy[p:p + 1, :], oz[p:p + 1, :])
            dirn = Vec3(dx[p:p + 1, :], dy[p:p + 1, :], dz[p:p + 1, :])
            actv = act[p:p + 1, :] > 0.0
            inv = Vec3(1.0 / dirn.x, 1.0 / dirn.y, 1.0 / dirn.z)

            # ray features [16,128]: [o-shift, d, (o-shift) x d, 1, 0...]
            osx, osy, osz = org.x - sx, org.y - sy, org.z - sz
            cxr = osy * dirn.z - osz * dirn.y
            cyr = osz * dirn.x - osx * dirn.z
            czr = osx * dirn.y - osy * dirn.x
            one = jnp.ones_like(org.x)
            zero = jnp.zeros_like(org.x)
            feats = jnp.concatenate(
                [osx, osy, osz, dirn.x, dirn.y, dirn.z, cxr, cyr, czr,
                 one, zero, zero, zero, zero, zero, zero], axis=0)

            bt0 = jnp.full((1, LANES), INF, jnp.float32)
            bs0 = jnp.full((1, LANES), -1, jnp.int32)
            c0 = (slb_s[par, p, 0] < INF) & jnp.any(actv)

            @pl.when(c0)
            def _(p=p):
                start_brick(0, order_s[par, p, 0])

            def cond(st):
                return st[1]

            def body(st, p=p, org=org, dirn=dirn, inv=inv, actv=actv,
                     feats=feats):
                r, _pend, bt, bs = st
                buf = lax.rem(r, 2)
                pltpu.make_async_copy(
                    coeff_hbm.at[0],
                    coeff_buf.at[pl.ds(buf * SLAB_ROWS, SLAB_ROWS), :],
                    sem_coeff.at[buf]).wait()
                pltpu.make_async_copy(subbox_hbm.at[0],
                                      subbox_buf.at[buf],
                                      sem_sub.at[buf]).wait()
                b = order_s[par, p, r]

                # prefetch r+1 with the PRE-update best-t (superset of the
                # true continue condition; see module docstring invariant)
                nxt = jnp.minimum(r + 1, Bpad - 1)
                sl_n = slb_s[par, p, nxt]
                need_n = ((r + 1 < Bpad) & (sl_n < INF)
                          & jnp.any(actv & (bt > sl_n)))

                @pl.when(need_n)
                def _():
                    start_brick(1 - buf, order_s[par, p, nxt])

                def sub_body(s, carry):
                    bt, bs = carry
                    return sub_pass(s, b, buf, bt, bs, org, dirn, inv,
                                    actv, feats)

                bt, bs = lax.fori_loop(0, NUM_SUBS, sub_body, (bt, bs))
                return (r + 1, need_n, bt, bs)

            st = lax.while_loop(cond, body, (jnp.int32(0), c0, bt0, bs0))
            out_t[p:p + 1, :] = jnp.where(actv, st[2], INF)
            out_slot[p:p + 1, :] = st[3]

    return kernel


def _trace_kernel_mx2(coeff, subbox, order, slb, ox, oy, oz, dx, dy, dz,
                      act, shift, tnear: float, interpret: bool = False):
    """Launch the packet kernel over all rows of a wave.  Ray SoA arrays
    are [M, 128]; order/slb are the cull's [M, Bpad] visit lists."""
    M = ox.shape[0]
    PK = PACKETS_PER_BLOCK
    assert M % PK == 0, M
    Mblocks = M // PK
    Bpad = order.shape[1]
    tn = jnp.full((1, 1), tnear, jnp.float32)
    sh = jnp.zeros((1, 4), jnp.float32).at[0, :3].set(shift)

    blk = pl.BlockSpec((PK, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    smem = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.SMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = (jax.ShapeDtypeStruct((M, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((M, LANES), jnp.int32))
    return pl.pallas_call(
        _make_mx2_kernel(Mblocks, Bpad),
        grid=(Mblocks,),
        in_specs=[smem((1, 1)), smem((1, 4))]
                 + [blk] * 7 + [any_] * 4,
        out_specs=(blk, blk),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2 * SLAB_ROWS, 128), jnp.float32),
                        pltpu.SMEM((2, 128), jnp.float32),
                        pltpu.SMEM((2, PK, Bpad), jnp.int32),
                        pltpu.SMEM((2, PK, Bpad), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(tn, sh, ox, oy, oz, dx, dy, dz, act, order, slb, subbox, coeff)


# ---------------------------------------------------------------------------
# XLA shell: cull -> kernel -> attribute recovery -> 16-channel record
# ---------------------------------------------------------------------------

def _trace_mx2(mx, org: Vec3, dirn: Vec3, tnear: float, active,
               interpret: bool = False):
    """Closest hit for one wave: the same 16-channel record contract as
    wavefront._trace_wave / mxtrace._trace_mx."""
    shape = org.x.shape
    S = mx.num_spheres
    B = mx.num_bricks
    Bpad = -(-B // 128) * 128

    lb = _interval_cull(org, dirn, active, mx.brick_lo, mx.brick_hi, tnear)
    # near-order via a key+payload lax.sort: measured 3.8 ms at [4800,576]
    # where jnp.argsort + take_along_axis costs 32 ms (tools/probe_hw2.py)
    iota = jnp.broadcast_to(
        jnp.arange(lb.shape[1], dtype=jnp.int32)[None, :], lb.shape)
    slb, order = lax.sort((lb, iota), num_keys=1, dimension=1)
    if Bpad > B:
        order = jnp.pad(order, ((0, 0), (0, Bpad - B)))
        slb = jnp.pad(slb, ((0, 0), (0, Bpad - B)),
                      constant_values=INF)

    act_f = jnp.where(active, 1.0, 0.0)
    t, slot = _trace_kernel_mx2(
        mx.coeff, mx.subbox, order, slb, org.x, org.y, org.z,
        dirn.x, dirn.y, dirn.z, act_f, mx.shift, tnear,
        interpret=interpret)

    # attributes + u/v from the winning slot (one gather + one MT solve)
    rows = jnp.take(mx.tri_rows, jnp.maximum(slot, 0).reshape(-1),
                    axis=0).reshape(shape + (32,))
    gv = lambda j: Vec3(rows[..., j], rows[..., j + 1], rows[..., j + 2])
    p0, e1, e2 = gv(1), gv(4), gv(7)
    pv = cross(dirn, e2)
    det = dot(e1, pv)
    det_s = jnp.where(det == 0.0, 1.0, det)
    tvec = org - p0
    u = dot(tvec, pv) / det_s
    qv = cross(tvec, e1)
    v = dot(dirn, qv) / det_s

    w = 1.0 - u - v
    pos = Vec3(p0.x + e1.x * u + e2.x * v,
               p0.y + e1.y * u + e2.y * v,
               p0.z + e1.z * u + e2.z * v)
    n0, n1, n2 = gv(10), gv(13), gv(16)
    ni = Vec3(n0.x * w + n1.x * u + n2.x * v,
              n0.y * w + n1.y * u + n2.y * v,
              n0.z * w + n1.z * u + n2.z * v)
    ng = cross(e1, e2)
    smooth = rows[..., 28] > 0.5
    ns = Vec3(jnp.where(smooth, ni.x, ng.x),
              jnp.where(smooth, ni.y, ng.y),
              jnp.where(smooth, ni.z, ng.z))
    mt, mp = rows[..., 19], rows[..., 23]
    alb, em = gv(20), gv(24)
    emit = rows[..., 27]
    t = jnp.where(slot >= 0, t, INF)

    # spheres: resident-table brute force (same math as the megakernel)
    sph_rows = mx.sph_rows
    for j in range(S):
        c = Vec3(sph_rows[j, 1], sph_rows[j, 2], sph_rows[j, 3])
        rad = sph_rows[j, 4]
        ts, hit = intersect_sphere(c, rad, org, dirn, tnear, t)
        closer = hit & (ts < t) & active
        spos = Vec3(org.x + dirn.x * ts, org.y + dirn.y * ts,
                    org.z + dirn.z * ts)
        sns = Vec3(spos.x - c.x, spos.y - c.y, spos.z - c.z)
        t = jnp.where(closer, ts, t)
        pos = where(closer, spos, pos)
        ns = where(closer, sns, ns)
        mt = jnp.where(closer, sph_rows[j, 19], mt)
        mp = jnp.where(closer, sph_rows[j, 23], mp)
        alb = where(closer, Vec3(sph_rows[j, 20], sph_rows[j, 21],
                                 sph_rows[j, 22]), alb)
        em = where(closer, Vec3(sph_rows[j, 24], sph_rows[j, 25],
                                sph_rows[j, 26]), em)
        emit = jnp.where(closer, sph_rows[j, 27], emit)

    t = jnp.where(active, t, INF)
    return (t, ns.x, ns.y, ns.z, pos.x, pos.y, pos.z, mt,
            alb.x, alb.y, alb.z, mp, em.x, em.y, em.z, emit)


# ---------------------------------------------------------------------------
# Render loop: the sorted-wavefront shell around the MX2 tracer
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("width", "height", "num_samples", "seed",
                                   "max_depth", "rr_start_depth",
                                   "sort_mode", "interpret"))
def _render_mx2(mx, cam_data, bg, scene_lo, scene_inv, pix_slots,
                sample_start, width: int, height: int, num_samples: int,
                seed: int, max_depth: int,
                rr_start_depth: int = RR_START_DEPTH,
                sort_mode: str = "mort_oct", num_real=None,
                light_rows=None, interpret: bool = False):
    R = width * height
    n_slots = pix_slots.shape[0]
    bg3 = Vec3(bg[0], bg[1], bg[2])

    pix = jnp.tile(pix_slots, num_samples)
    samp = jnp.repeat(jnp.arange(num_samples, dtype=jnp.uint32), n_slots)
    rows = (n_slots * num_samples) // LANES
    shape = (rows, LANES)
    pix2 = pix.reshape(shape)
    valid = pix2 < R
    if num_real is not None:
        valid = valid & (samp.reshape(shape) < num_real.astype(jnp.uint32))

    state = rng.seed_rays(pix2.astype(jnp.uint32),
                          sample_start + samp.reshape(shape), seed)
    state, u1 = rng.next_uniform(state)
    state, u2 = rng.next_uniform(state)
    i = (pix2 % width).astype(jnp.float32)
    j = (pix2 // width).astype(jnp.float32)
    org, dirn = camera_rays(cam_data, (i + u1) / width, (j + u2) / height)

    T3 = Vec3.full(shape, (1.0, 1.0, 1.0))
    L = Vec3.zeros(shape)
    active = valid

    def trace_shade(org, dirn, Tv, L, active, state, depth, tnear):
        rec = _trace_mx2(mx, org, dirn, tnear, active, interpret)
        if light_rows is not None:
            def shadow_t(sorg, sdir, mask):
                srec = _trace_mx2(mx, sorg, sdir, SECONDARY_TNEAR, mask,
                                  interpret)
                return srec[0]
            L = L + _nee_term(rec, dirn, Tv, active, light_rows, shadow_t)
        return _shade(rec, org, dirn, Tv, L, active, state, depth, bg3,
                      rr_start_depth, max_depth)

    org, dirn, T3, L, active, state = trace_shade(
        org, dirn, T3, L, active, state, jnp.int32(0), 0.0)

    def cond(st):
        return jnp.any(st[0]) & (st[1] < max_depth)

    def body(st):
        (active, depth, ox, oy, oz, dx, dy, dz, Tx, Ty, Tz,
         Lx, Ly, Lz, pixc, state) = st
        org, dirn = Vec3(ox, oy, oz), Vec3(dx, dy, dz)
        if sort_mode != "none":
            key = _sort_key(org, dirn, active, scene_lo, scene_inv)
            flat = lambda a: a.reshape(-1)
            cols = lax.sort(
                (flat(key), flat(ox), flat(oy), flat(oz), flat(dx),
                 flat(dy), flat(dz), flat(Tx), flat(Ty), flat(Tz),
                 flat(Lx), flat(Ly), flat(Lz), flat(pixc), flat(state),
                 flat(jnp.where(active, 1.0, 0.0))),
                num_keys=1)
            (ox, oy, oz, dx, dy, dz, Tx, Ty, Tz, Lx, Ly, Lz, pixc,
             state, act_f) = (c.reshape(shape) for c in cols[1:])
            org, dirn = Vec3(ox, oy, oz), Vec3(dx, dy, dz)
            active = act_f > 0.0
        Tv, L = Vec3(Tx, Ty, Tz), Vec3(Lx, Ly, Lz)
        org, dirn, Tv, L, active, state = trace_shade(
            org, dirn, Tv, L, active, state, depth, SECONDARY_TNEAR)
        return (active, depth + 1, org.x, org.y, org.z,
                dirn.x, dirn.y, dirn.z, Tv.x, Tv.y, Tv.z, L.x, L.y, L.z,
                pixc, state)

    st = (active, jnp.int32(1), org.x, org.y, org.z, dirn.x, dirn.y,
          dirn.z, T3.x, T3.y, T3.z, L.x, L.y, L.z, pix2, state)
    st = lax.while_loop(cond, body, st)
    Lx, Ly, Lz, pixc = st[11], st[12], st[13], st[14]

    img = jnp.stack([
        jax.ops.segment_sum(c.reshape(-1), pixc.reshape(-1),
                            num_segments=R + 1)[:R]
        for c in (Lx, Ly, Lz)], axis=-1)
    return img.reshape(height, width, 3)


def render_samples_mx2(mx: MX2Set, cam_data, width: int, height: int,
                       sample_start, num_samples: int = 1, seed: int = 1984,
                       max_depth: int = MAX_DEPTH,
                       rr_start_depth: int = RR_START_DEPTH,
                       sort_mode: str = "mort_oct", nee: bool = False,
                       num_real=None, pix_slots=None,
                       interpret: bool = False):
    """MX2 drop-in for render_samples_wavefront: the [H,W,3] radiance SUM
    of ``num_samples`` passes.  ``pix_slots`` overrides the slot->pixel map
    (multi-chip shards pass their own slice)."""
    bg = jnp.stack([jnp.asarray(mx.bg_r), jnp.asarray(mx.bg_g),
                    jnp.asarray(mx.bg_b)])
    lo = jnp.asarray(mx.scene_lo)
    inv = 1.0 / jnp.maximum(jnp.asarray(mx.scene_hi) - lo, 1e-12)
    if pix_slots is None:
        pix_slots, _ = _wave_layout(width, height)
    n_slots = pix_slots.shape[0]
    light_rows = None
    if nee and int(mx.light_pos.shape[0]) > 0:
        light_rows = jnp.concatenate(
            [jnp.asarray(mx.light_pos, jnp.float32),
             jnp.asarray(mx.light_intensity, jnp.float32)], axis=1)

    chunk = max(1, MAX_RAYS_PER_WAVE // n_slots)
    acc = None
    done = 0
    while done < num_samples:
        ns = min(chunk, num_samples - done)
        nr = None
        if num_real is not None:
            nr = jnp.clip(num_real.astype(jnp.int32) - done, 0, ns)
        out = _render_mx2(
            mx, cam_data, bg, lo, inv, jnp.asarray(pix_slots),
            jnp.asarray(sample_start, jnp.uint32) + jnp.uint32(done),
            width, height, ns, seed, max_depth,
            rr_start_depth=rr_start_depth, sort_mode=sort_mode,
            num_real=nr, light_rows=light_rows, interpret=interpret)
        acc = out if acc is None else acc + out
        done += ns
    return acc
