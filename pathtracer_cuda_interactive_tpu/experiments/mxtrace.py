"""MXU wavefront tracer: ray/triangle intersection as systolic matmuls.

The brick tracer (ops/brickkernel.py) and its sorted-wavefront shell
(ops/wavefront.py) intersect packets against bricks with per-primitive VPU
vector ops gated by a scalar tree walk — the whole packet pays the
traversal UNION of its rays, measured at ~36x useful work on bunny
primaries (tools/kernel_stats.py).  This module replaces both the walk and
the VPU loop with two dense, TPU-shaped stages per bounce:

  1. CULL   — packets of ``MX_PACKET`` sorted rays are bounded (origin box
     + direction interval) and tested against ALL brick AABBs at once with
     conservative interval arithmetic: one [packets, bricks] elementwise
     pass, no tree, no scalar unit.  Overlapped bricks are ordered by
     conservative entry distance (one lax.sort row per packet).
  2. INTERSECT — a while_loop over "rounds": each round, every unfinished
     packet takes its next-nearest brick and intersects all P rays against
     its T triangles with ONE [P,10] x [10,4T] matmul in the Plucker
     feature basis (models/mxset.py), then a sign-corrected validity
     epilogue and a min-reduction update the per-ray closest hit.  A packet
     stops as soon as every live ray's best t is at or below the entry
     bound of its next brick (the near-first early-out of a classic BVH
     walk, at packet granularity).

Attributes (normals, material, emission) are fetched once per bounce by a
single gather of the winning slot's 32-float row — the layout shared with
the megakernel — producing the same 16-channel hit record as
ops/wavefront.py::_trace_wave, so the sorted-wavefront shading/sort loop is
reused unchanged.  Semantics: radiance.cuh:21-79 via wavefront._shade;
parity asserted against the XLA oracle in tests/test_mxtrace.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .mxset import MXSet
from ..ops import rng
from ..ops.geometry import intersect_sphere
from ..ops.integrator import (LANES, MAX_DEPTH, RR_START_DEPTH, SECONDARY_TNEAR)
from ..ops.vec import Vec3, where
from ..ops.wavefront import (_nee_term, _shade, _sort_key, _wave_layout,
                        camera_rays)

INF = float("inf")
MX_PACKET = 128          # rays per cull packet == one [1, 128] SoA row
# Wave cap for THIS path, far below wavefront's 2^21: each _mx_rounds
# iteration materializes a [M, 128, 4T] f32 intermediate (M = wave/128),
# so a 2^21-ray wave would stage ~4.3 GB per round (ADVICE r2).  2^18
# bounds it at ~540 MB; one full 640x480 frame still fits a single wave.
MX_MAX_RAYS_PER_WAVE = 1 << 18


# ---------------------------------------------------------------------------
# Stage 1: conservative packet-frustum vs brick-AABB cull — shared with the
# pair tracer (ops/pairtrace.py owns the implementation; here each packet
# is one [1, 128] SoA row)
# ---------------------------------------------------------------------------

from ..ops.pairtrace import _interval_cull, _minmax_masked  # noqa: E402,F401


# ---------------------------------------------------------------------------
# Stage 2: matmul intersection rounds
# ---------------------------------------------------------------------------

def _features(org: Vec3, dirn: Vec3):
    """[M, P, 10] Plucker ray features [o, d, o x d, 1] (models/mxset.py)."""
    cx = org.y * dirn.z - org.z * dirn.y
    cy = org.z * dirn.x - org.x * dirn.z
    cz = org.x * dirn.y - org.y * dirn.x
    return jnp.stack([org.x, org.y, org.z, dirn.x, dirn.y, dirn.z,
                      cx, cy, cz, jnp.ones_like(org.x)], axis=-1)


def _mx_rounds(coeff, order, slb, feats, live, tnear, T: int, B: int):
    """While-loop over nearest-brick rounds.  feats [M,P,10]; live [M,P];
    order/slb [M,B] (brick visit order / conservative entry bounds).
    Returns (t, u, v, slot) per ray, slot = brick*T + k or -1."""
    M, P = live.shape

    def need(r, bt):
        lbr = lax.dynamic_slice_in_dim(slb, r, 1, axis=1)[:, 0]     # [M]
        open_pk = jnp.isfinite(lbr)
        ray_need = live & (bt > lbr[:, None])
        return jnp.any(ray_need, axis=1) & open_pk                  # [M]

    def cond(st):
        r, bt = st[0], st[1]
        return (r < B) & jnp.any(need(r, bt))

    def body(st):
        r, bt, bu, bv, bslot = st
        lbr = lax.dynamic_slice_in_dim(slb, r, 1, axis=1)[:, 0]
        bid = lax.dynamic_slice_in_dim(order, r, 1, axis=1)[:, 0]   # [M]
        act = need(r, bt)
        cf = jnp.take(coeff, bid, axis=0)            # [M, 10, 4T] gather
        out = jax.lax.dot_general(
            feats, cf, (((2,), (1,)), ((0,), (0,))),
            precision=lax.Precision.HIGHEST)         # [M, P, 4T]
        det = out[..., 0 * T:1 * T]
        U = out[..., 1 * T:2 * T]
        V = out[..., 2 * T:3 * T]
        Tt = out[..., 3 * T:4 * T]
        s = jnp.sign(det)
        su, sv, sd = U * s, V * s, det * s
        tt = Tt / jnp.where(det == 0.0, 1.0, det)
        valid = ((det != 0.0) & (su >= 0.0) & (sv >= 0.0)
                 & (su + sv <= sd) & (tt > tnear) & (tt < bt[..., None])
                 & live[..., None] & act[:, None, None])
        tv = jnp.where(valid, tt, INF)
        k = jnp.argmin(tv, axis=-1)                                 # [M,P]
        ke = k[..., None]
        tm = jnp.take_along_axis(tv, ke, axis=-1)[..., 0]
        better = tm < bt
        inv_d = 1.0 / jnp.where(
            jnp.take_along_axis(det, ke, axis=-1)[..., 0] == 0.0, 1.0,
            jnp.take_along_axis(det, ke, axis=-1)[..., 0])
        um = jnp.take_along_axis(U, ke, axis=-1)[..., 0] * inv_d
        vm = jnp.take_along_axis(V, ke, axis=-1)[..., 0] * inv_d
        slot = bid[:, None] * T + k.astype(jnp.int32)
        return (r + 1,
                jnp.where(better, tm, bt),
                jnp.where(better, um, bu),
                jnp.where(better, vm, bv),
                jnp.where(better, slot, bslot))

    bt = jnp.full((M, P), INF, jnp.float32)
    zero = jnp.zeros((M, P), jnp.float32)
    bslot = jnp.full((M, P), -1, jnp.int32)
    st = (jnp.int32(0), bt, zero, zero, bslot)
    st = lax.while_loop(cond, body, st)
    return st[1], st[2], st[3], st[4]


# ---------------------------------------------------------------------------
# Full one-bounce closest hit: spheres + MX bricks -> 16-channel record
# ---------------------------------------------------------------------------

def _trace_mx(coeff, brick_lo, brick_hi, tri_rows, sph_rows,
              org: Vec3, dirn: Vec3, tnear: float, active,
              S: int, B: int, T: int):
    shape = org.x.shape
    lb = _interval_cull(org, dirn, active, brick_lo, brick_hi, tnear)
    # key+payload lax.sort: 8.5x cheaper than argsort+take_along_axis at
    # this shape (tools/probe_hw2.py cull_* probes)
    iota = jnp.broadcast_to(
        jnp.arange(lb.shape[1], dtype=jnp.int32)[None, :], lb.shape)
    slb, order = lax.sort((lb, iota), num_keys=1, dimension=1)
    feats = _features(org, dirn)
    t, u, v, slot = _mx_rounds(coeff, order, slb, feats, active, tnear,
                               T, B)

    # triangle attributes: one gather of the winning slot's 32-float row
    rows = jnp.take(tri_rows, jnp.maximum(slot, 0).reshape(-1),
                    axis=0).reshape(shape + (32,))
    gv = lambda j: Vec3(rows[..., j], rows[..., j + 1], rows[..., j + 2])
    p0, e1, e2 = gv(1), gv(4), gv(7)
    w = 1.0 - u - v
    pos = Vec3(p0.x + e1.x * u + e2.x * v,
               p0.y + e1.y * u + e2.y * v,
               p0.z + e1.z * u + e2.z * v)
    n0, n1, n2 = gv(10), gv(13), gv(16)
    ni = Vec3(n0.x * w + n1.x * u + n2.x * v,
              n0.y * w + n1.y * u + n2.y * v,
              n0.z * w + n1.z * u + n2.z * v)
    ng = Vec3(e1.y * e2.z - e1.z * e2.y,
              e1.z * e2.x - e1.x * e2.z,
              e1.x * e2.y - e1.y * e2.x)
    smooth = rows[..., 28] > 0.5
    ns = Vec3(jnp.where(smooth, ni.x, ng.x),
              jnp.where(smooth, ni.y, ng.y),
              jnp.where(smooth, ni.z, ng.z))
    mt, mp = rows[..., 19], rows[..., 23]
    alb, em = gv(20), gv(24)
    emit = rows[..., 27]
    t = jnp.where(slot >= 0, t, INF)

    # spheres: resident-table brute force (same math as the megakernel)
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
# Render loop: the sorted-wavefront shell around the MX tracer
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("width", "height", "num_samples", "seed",
                                   "max_depth", "S", "B", "T",
                                   "rr_start_depth", "sort_mode"))
def _render_mx(coeff, brick_lo, brick_hi, tri_rows, sph_rows, cam_data,
               bg, scene_lo, scene_inv, pix_slots, sample_start,
               width: int, height: int, num_samples: int, seed: int,
               max_depth: int, S: int, B: int, T: int,
               rr_start_depth: int = RR_START_DEPTH,
               sort_mode: str = "mort_oct", num_real=None, light_rows=None):
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
        rec = _trace_mx(coeff, brick_lo, brick_hi, tri_rows, sph_rows,
                        org, dirn, tnear, active, S, B, T)
        if light_rows is not None:
            def shadow_t(sorg, sdir, mask):
                srec = _trace_mx(coeff, brick_lo, brick_hi, tri_rows,
                                 sph_rows, sorg, sdir, SECONDARY_TNEAR,
                                 mask, S, B, T)
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


def render_samples_mx(mx: MXSet, cam_data, width: int, height: int,
                      sample_start, num_samples: int = 1, seed: int = 1984,
                      max_depth: int = MAX_DEPTH,
                      rr_start_depth: int = RR_START_DEPTH,
                      sort_mode: str = "mort_oct",
                      nee: bool = False, num_real=None, pix_slots=None):
    """MXU-tracer drop-in for render_samples_wavefront: the [H,W,3]
    radiance SUM of ``num_samples`` passes.  ``pix_slots`` overrides the
    slot->pixel map (multi-chip shards pass their own slice)."""
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

    # The cap is per WAVE (rays per launch), not per sample batch: when one
    # single-sample wave over all slots already exceeds it, slice the slot
    # space itself (whole 32x128-ray tile blocks, so packets stay coherent)
    # and sum the per-slice images — segment_sum scatters each slice to its
    # own pixels, so the partial images add exactly (ADVICE r3 medium).
    gran = 32 * LANES
    if n_slots > MX_MAX_RAYS_PER_WAVE:
        slice_len = max(gran, MX_MAX_RAYS_PER_WAVE // gran * gran)
    else:
        slice_len = n_slots
    pix_slots = jnp.asarray(pix_slots)
    acc = None
    for s0 in range(0, n_slots, slice_len):
        slots = pix_slots[s0:s0 + slice_len]
        chunk = max(1, MX_MAX_RAYS_PER_WAVE // int(slots.shape[0]))
        done = 0
        while done < num_samples:
            ns = min(chunk, num_samples - done)
            nr = None
            if num_real is not None:
                nr = jnp.clip(num_real.astype(jnp.int32) - done, 0, ns)
            out = _render_mx(
                mx.coeff, mx.brick_lo, mx.brick_hi, mx.tri_rows,
                mx.sph_rows, cam_data, bg, lo, inv, slots,
                jnp.asarray(sample_start, jnp.uint32) + jnp.uint32(done),
                width, height, ns, seed, max_depth, mx.num_spheres,
                mx.num_bricks, mx.brick_prims,
                rr_start_depth=rr_start_depth, sort_mode=sort_mode,
                num_real=nr, light_rows=light_rows)
            acc = out if acc is None else acc + out
            done += ns
    return acc
