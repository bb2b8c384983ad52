"""Sorted-wavefront brick tracer: bounce-synchronous re-packetization.

The persistent-lane brick kernel (ops/brickkernel.py) keeps every ray in
the packet it was born in; after one diffuse bounce a 2048-lane packet's
rays point everywhere and the packet pays the traversal UNION of all of
them — the lockstep-divergence failure mode that makes full-depth bunny
~100x slower than primary-only (SURVEY.md §7 hard part 1).

This module restructures the same computation the TPU way: bounces become
synchronous WAVES over the whole frame's rays, and between waves the rays
are re-sorted so each [WAVE_ROWS, 128] packet is spatially/directionally
coherent again:

  wave 0   camera rays in TILE screen tiles (already coherent; no sort)
  wave b   one fused ``lax.sort`` of the live-ray SoA by a coherence key
           (default "sig_mort": a 16-bit TARGET SIGNATURE — which coarse
           scene regions the ray's line can touch, _sig_key — above an
           origin Morton code; dead rays sort to the end so trailing
           packets are all-dead and their tree walk exits at the root
           test) ... then one grid launch of the one-bounce Pallas trace
           kernel (the brickkernel intersector minus the bounce state
           machine — or the pair-list grid, ops/pairtrace.py, via
           ``trace="pairs"``), then fully-vectorized XLA shading/BRDF
           sampling/Russian roulette (ops/brdf.py — the same code path the
           oracle integrator uses).

The sort is the whole trick, and on TPU it is nearly free: ``lax.sort`` of
614k keys + 14 payload columns measures ~0.1 ms on v5e
(tools/microbench_sort.py) versus multiple ms per bounce of packet-union
traversal that it saves.  Radiance lands in per-ray ``L`` and one final
``segment_sum`` scatters it to pixels, so pixel indices ride i32 the whole
way (no f32 2^24 limit on this path).

Semantics: radiance.cuh:21-79 bounce logic, same PCG streams per
(pixel, sample) as ops/integrator.py (2 camera jitter + 3 BSDF + 1 RR per
bounce), so images agree with the oracle XLA path within intersection-order
noise; tests/test_wavefront.py asserts it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.bricks import (BRICK_DATA_ROWS, BRICK_ROWS, STACK_DEPTH,
                             BrickSet)
from . import brdf, rng
from .brickkernel import (make_brick_intersect,
                          make_brick_intersect_pipelined)
from .pairtrace import trace_wave_pairs
from .geometry import intersect_sphere
from .integrator import (LANES, MAX_DEPTH, RR_START_DEPTH, SECONDARY_TNEAR)
from .megakernel import tile_grid
from .vec import Vec3, cross, dot, max_elem, normalize, where

# Rays per packet row-block: [WAVE_ROWS, 128] rays share one tree walk.
# Re-swept every time the kernel cost balance moves: r3/r4 (rolled tri
# loops, scalar-walk-bound) measured 32 rows best; r5's fully-unrolled
# tri+chunk loops shift the balance to union cost and 16 rows wins
# (bunny 1.50 vs 1.30 at 32, 1.14 at 8 — PERFLOG r5).  PT_WAVE_ROWS
# overrides for sweeps.
WAVE_ROWS = int(__import__("os").environ.get("PT_WAVE_ROWS", "16"))
# primary-wave screen tile: must cover exactly WAVE_ROWS*128 pixels
TILE = (64, WAVE_ROWS * 128 // 64)
INF = float("inf")
# Cap on rays per wavefront launch; sample batches beyond this render in
# chunks (keeps the 17-column live SoA + sort double buffer under ~300 MB).
MAX_RAYS_PER_WAVE = 1 << 21


def _make_trace_kernel(S: int, collect_stats: bool = False):
    """One-bounce closest-hit kernel: packet of [WAVE_ROWS, 128] rays in,
    16 hit-record channels out (the _select16 tuple of brickkernel).
    With ``collect_stats``, a 17th channel carries per-packet traversal
    counters (row 0 = nodes stepped, row 1 = bricks DMA'd, row 2 = chunks
    tested — broadcast across lanes)."""

    def kernel(sph_ref, boxes_ref, links_ref, tn_ref, ox, oy, oz,
               dx, dy, dz, act, bricks_ref, *outs):
        n_out = 17 if collect_stats else 16
        scratch, stack_ref, sem = outs[n_out:]
        intersect = make_brick_intersect(sph_ref, boxes_ref, links_ref,
                                         bricks_ref, scratch, stack_ref,
                                         sem, S, collect_stats=collect_stats)
        org = Vec3(ox[:], oy[:], oz[:])
        dirn = Vec3(dx[:], dy[:], dz[:])
        shape = org.x.shape
        active = act[:] > 0.0
        tnear = jnp.full(shape, tn_ref[0, 0])
        rec = intersect(org, dirn, tnear, shape, active)
        (t, ns, pos, mt, alb, mp, em, emit) = rec[:8]
        vals = (t, ns.x, ns.y, ns.z, pos.x, pos.y, pos.z, mt,
                alb.x, alb.y, alb.z, mp, em.x, em.y, em.z, emit)
        for ref, v in zip(outs[:16], vals):
            ref[:] = v
        if collect_stats:
            nodes, bricks, chunks = rec[8]
            rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            sv = jnp.where(rid == 0, nodes.astype(jnp.float32),
                           jnp.where(rid == 1, bricks.astype(jnp.float32),
                                     jnp.where(rid == 2,
                                               chunks.astype(jnp.float32),
                                               0.0)))
            outs[16][:] = sv

    return kernel


def _make_trace_kernel_slim(S: int, group_rows: int = 0):
    """Slim one-bounce kernel: (best_t, best_slot) out, 2 channels instead
    of 16.  The inner tri loop runs _tri_slot_body (~30 vector ops/tri vs
    ~80), spheres and winner attributes move to the XLA epilogue
    (_record_from_slots).  Measured on v5e bunny: a modest win (~25% off
    the tri-loop share; the walk's scalar cost dominates the kernel) plus
    8x less output traffic per wave."""

    def kernel(sph_ref, boxes_ref, links_ref, tn_ref, ox, oy, oz,
               dx, dy, dz, act, bricks_ref, out_t, out_slot,
               scratch, stack_ref, sem):
        intersect = make_brick_intersect(sph_ref, boxes_ref, links_ref,
                                         bricks_ref, scratch, stack_ref,
                                         sem, S, slim=True,
                                         group_rows=group_rows)
        org = Vec3(ox[:], oy[:], oz[:])
        dirn = Vec3(dx[:], dy[:], dz[:])
        shape = org.x.shape
        active = act[:] > 0.0
        tnear = jnp.full(shape, tn_ref[0, 0])
        t, slot = intersect(org, dirn, tnear, shape, active)
        out_t[:] = t
        out_slot[:] = slot

    return kernel


def _make_trace_kernel_slim2():
    """Slim one-bounce kernel over the DMA-pipelined walk
    (brickkernel.make_brick_intersect_pipelined): leaf N's tri loops run
    while leaf N+1's brick copy flies."""

    def kernel(boxes_ref, links_ref, tn_ref, ox, oy, oz,
               dx, dy, dz, act, bricks_ref, out_t, out_slot,
               scratch, stack_ref, sems):
        intersect = make_brick_intersect_pipelined(
            boxes_ref, links_ref, bricks_ref, scratch, stack_ref, sems)
        org = Vec3(ox[:], oy[:], oz[:])
        dirn = Vec3(dx[:], dy[:], dz[:])
        shape = org.x.shape
        active = act[:] > 0.0
        tnear = jnp.full(shape, tn_ref[0, 0])
        t, slot = intersect(org, dirn, tnear, shape, active)
        out_t[:] = t
        out_slot[:] = slot

    return kernel


def _trace_wave_slim2(top_boxes, top_links, brick_data, tnear_scalar,
                      ox, oy, oz, dx, dy, dz, act,
                      interpret: bool = False):
    """DMA-pipelined slim trace: same (t, slot) contract as
    _trace_wave_slim (spheres in the caller's epilogue)."""
    rows = ox.shape[0]
    n_blocks = rows // WAVE_ROWS
    assert brick_data.shape[0] * 512 < 2 ** 24
    tn = jnp.full((1, 1), tnear_scalar, jnp.float32)
    smem = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((WAVE_ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = tuple(jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
                      for _ in range(2))
    t, slot = pl.pallas_call(
        _make_trace_kernel_slim2(),
        grid=(n_blocks,),
        in_specs=[smem(top_boxes.shape), smem(top_links.shape),
                  smem((1, 1))]
                 + [ray_spec] * 7
                 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(ray_spec, ray_spec),
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((2, BRICK_ROWS, 128), jnp.float32),
                        pltpu.SMEM((STACK_DEPTH,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(top_boxes, top_links, tn, ox, oy, oz, dx, dy, dz, act, brick_data)
    return t, slot.astype(jnp.int32)


def _trace_wave_slim(sph_rows, top_boxes, top_links, brick_data,
                     tnear_scalar, ox, oy, oz, dx, dy, dz, act, S: int,
                     interpret: bool = False, group_rows: int = 0,
                     packet_rows: int = 0):
    """Slim trace over all packets of a wave -> (t [rows,128] f32,
    slot [rows,128] i32; -1 = no triangle hit).  Spheres NOT included —
    the caller folds them in (_record_from_slots / _sphere_tmin).
    ``packet_rows`` overrides the rays-per-walk granularity (default
    WAVE_ROWS) — the compacted tail uses smaller packets whose unions
    stay bounded on divergence-heavy late waves."""
    rows = ox.shape[0]
    pr = packet_rows or WAVE_ROWS
    n_blocks = rows // pr
    # the winning slot rides an f32 channel through the kernel: exact only
    # below 2^24 (ADVICE r3) — larger scenes must take the pair tracer,
    # whose slots ride i32 (ops/pairtrace.py)
    assert brick_data.shape[0] * 512 < 2 ** 24, (
        "slim-walk tracer slot ids ride f32; scenes over 32,768 bricks "
        "(~16.7M prims) must use the pair tracer (trace='pairs')")
    tn = jnp.full((1, 1), tnear_scalar, jnp.float32)
    smem = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((pr, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = tuple(jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
                      for _ in range(2))
    t, slot = pl.pallas_call(
        _make_trace_kernel_slim(S, group_rows),
        grid=(n_blocks,),
        in_specs=[smem(sph_rows.shape), smem(top_boxes.shape),
                  smem(top_links.shape), smem((1, 1))]
                 + [ray_spec] * 7
                 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(ray_spec, ray_spec),
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((BRICK_ROWS, 128), jnp.float32),
                        pltpu.SMEM((STACK_DEPTH,), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(sph_rows, top_boxes, top_links, tn, ox, oy, oz, dx, dy, dz, act,
      brick_data)
    return t, slot.astype(jnp.int32)


def _sphere_tmin(sph_rows, S: int, org: Vec3, dirn: Vec3, tnear: float, t):
    """Fold the resident sphere table into a best-t (occlusion queries)."""
    for j in range(S):
        c = Vec3(sph_rows[j, 1], sph_rows[j, 2], sph_rows[j, 3])
        ts, hit = intersect_sphere(c, sph_rows[j, 4], org, dirn, tnear, t)
        t = jnp.where(hit & (ts < t), ts, t)
    return t


def _record_from_slots(tri_rows, sph_rows, S: int, t, slot, org: Vec3,
                       dirn: Vec3, tnear: float, active):
    """Winner-attribute recovery: one 32-float gather per ray + a
    Moller-Trumbore re-solve for (u, v), then the resident-sphere loop —
    the same epilogue the MX2 tracer uses (ops/mx2.py::_trace_mx2).
    Returns the 16-channel hit record of _make_trace_kernel."""
    shape = org.x.shape
    rows = jnp.take(tri_rows, jnp.maximum(slot, 0).reshape(-1),
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


def _trace_wave(sph_rows, top_boxes, top_links, brick_data, tnear_scalar,
                ox, oy, oz, dx, dy, dz, act, S: int,
                interpret: bool = False, collect_stats: bool = False):
    """Run the trace kernel over all packets of a wave.  Ray SoA arrays are
    [rows, 128] with rows a multiple of WAVE_ROWS."""
    rows = ox.shape[0]
    n_blocks = rows // WAVE_ROWS
    tn = jnp.full((1, 1), tnear_scalar, jnp.float32)

    n_out = 17 if collect_stats else 16
    smem = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((WAVE_ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = tuple(jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
                      for _ in range(n_out))
    kernel = _make_trace_kernel(S, collect_stats)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[smem(sph_rows.shape), smem(top_boxes.shape),
                  smem(top_links.shape), smem((1, 1))]
                 + [ray_spec] * 7
                 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(ray_spec for _ in range(n_out)),
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((BRICK_ROWS, 128), jnp.float32),
                        pltpu.SMEM((STACK_DEPTH,), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(sph_rows, top_boxes, top_links, tn, ox, oy, oz, dx, dy, dz, act,
      brick_data)


def _spread3(x):
    """Interleave the low 10 bits of i32 x with two zero bits each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _sort_key(org: Vec3, dirn: Vec3, active, lo, inv_extent):
    """Coherence key: 21-bit Morton code of the ray origin (scene-box
    normalized) in the high bits, direction octant in the low 3 — packets
    get origin locality first, direction agreement second (the 'c+mort'
    winner of tools/sim_wave.py).  Dead rays key to INT32_MAX and sink to
    the tail of the sort."""
    def q(c, l, s):
        x = jnp.clip((c - l) * s * 127.0, 0.0, 127.0)
        return x.astype(jnp.int32)

    mx = _spread3(q(org.x, lo[0], inv_extent[0]))
    my = _spread3(q(org.y, lo[1], inv_extent[1]))
    mz = _spread3(q(org.z, lo[2], inv_extent[2]))
    morton = (mx << 2) | (my << 1) | mz
    octant = ((dirn.x > 0).astype(jnp.int32) * 4
              + (dirn.y > 0).astype(jnp.int32) * 2
              + (dirn.z > 0).astype(jnp.int32))
    key = (morton << 3) | octant
    return jnp.where(active, key, jnp.int32(np.iinfo(np.int32).max))


def _sig_key(org: Vec3, dirn: Vec3, active, lo, inv_extent, coarse,
             octant: bool = False):
    """Target-signature sort key: the high K = SIG_BOXES bits say WHICH
    coarse scene regions (top-tree subtree boxes,
    models/bricks.py::_coarse_cut) the ray's forward line can touch; the
    low 3*mb bits (mb = min(7, (30-K)//3) Morton bits per axis — 12 bits
    at the default K=16) are the origin Morton code.  Secondary hemispheres from one surface patch mix rays bound for
    the geometry with rays bound for the background — origin locality
    alone cannot separate them, and measured wave-1 packets saw 506 of
    803 bricks each (tools/probe_waves.py).  Grouping by reachable-region
    signature first makes the pair tracer's interval cull see packets
    whose rays agree about where they are going: all-background packets
    cull to ZERO pairs.  Dead rays key to INT32_MAX and sink."""
    inv = Vec3(1.0 / dirn.x, 1.0 / dirn.y, 1.0 / dirn.z)
    sig = jnp.zeros(org.x.shape, jnp.int32)
    for k in range(int(coarse.shape[0])):
        tx0 = (coarse[k, 0] - org.x) * inv.x
        tx1 = (coarse[k, 3] - org.x) * inv.x
        ty0 = (coarse[k, 1] - org.y) * inv.y
        ty1 = (coarse[k, 4] - org.y) * inv.y
        tz0 = (coarse[k, 2] - org.z) * inv.z
        tz1 = (coarse[k, 5] - org.z) * inv.z
        tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.minimum(tz0, tz1))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                     jnp.maximum(ty0, ty1)),
                         jnp.maximum(tz0, tz1))
        hit = (tf >= jnp.maximum(tn, 0.0)) & (coarse[k, 6] > 0.0)
        sig = sig | jnp.where(hit, jnp.int32(1 << k), 0)

    # Morton bits shrink as the signature widens so the key stays in i32:
    # K sig bits (+3 octant bits) + 3*mb Morton bits <= 30
    K = int(coarse.shape[0])
    mb = min(7, (30 - K - (3 if octant else 0)) // 3)
    top = float(2 ** mb - 1)

    def q(c, l, s):
        x = jnp.clip((c - l) * s * top, 0.0, top)
        return x.astype(jnp.int32)

    mx = _spread3(q(org.x, lo[0], inv_extent[0]))
    my = _spread3(q(org.y, lo[1], inv_extent[1]))
    mz = _spread3(q(org.z, lo[2], inv_extent[2]))
    morton = (mx << 2) | (my << 1) | mz
    key = (sig << (3 * mb)) | morton
    if octant:
        # direction octant between signature and Morton: same-signature
        # rays additionally agree on travel direction, so the walk's
        # mean-direction near-first ordering is meaningful again and
        # best-t tightens early (r5 census: divergent packets run 4-6x
        # the chunk loops of coherent ones)
        oc = ((dirn.x > 0).astype(jnp.int32) * 4
              + (dirn.y > 0).astype(jnp.int32) * 2
              + (dirn.z > 0).astype(jnp.int32))
        key = (sig << (3 * mb + 3)) | (oc << (3 * mb)) | morton
    return jnp.where(active, key, jnp.int32(np.iinfo(np.int32).max))


def _nee_term(rec, dirn, T, active, light_rows, shadow_t):
    """Point-light next-event estimation for one wave: the direct-lighting
    radiance to add at each hit (ops/integrator.py::_direct_point_lights
    semantics — deterministic, no RNG draws, so sample streams stay
    bit-identical).  ``shadow_t(org, wo, mask) -> t`` traces a shadow wave
    through the brick tree and returns the closest-hit distance (inf=clear).
    """
    (t, nsx, nsy, nsz, px, py, pz, mt, ar, ag, ab, mp, *_rest) = rec
    shape = t.shape
    zero = Vec3.zeros(shape)
    hit = active & (t < INF)
    ns = normalize(Vec3(nsx, nsy, nsz))
    wi = -dirn
    cos_view = dot(wi, ns)
    n = where(cos_view < 0.0, -ns, ns)
    mat = brdf.MatLookup(mtype=mt, color=Vec3(ar, ag, ab), param=mp)
    pos = Vec3(px, py, pz)
    out = zero
    for l in range(int(light_rows.shape[0])):
        d = Vec3(light_rows[l, 0] - pos.x, light_rows[l, 1] - pos.y,
                 light_rows[l, 2] - pos.z)
        dist2 = dot(d, d)
        dist = jnp.sqrt(dist2)
        wo = d * (1.0 / jnp.maximum(dist, 1e-20))
        ev_value, _ = brdf.eval_brdf(mat, n, wi, wo)
        ts = shadow_t(pos, wo, hit)
        occ = ts < dist * (1.0 - 1e-3)
        inten = Vec3(jnp.full(shape, light_rows[l, 3]),
                     jnp.full(shape, light_rows[l, 4]),
                     jnp.full(shape, light_rows[l, 5]))
        contrib = T * ev_value * inten * (1.0 / jnp.maximum(dist2, 1e-20))
        out = out + where(hit & ~occ, contrib, zero)
    return out


def _shade(rec, org, dirn, T, L, active, state, depth, bg,
           rr_start_depth: int, max_depth: int):
    """One bounce of the radiance.cuh:21-79 state machine, given the trace
    kernel's 16-channel hit record.  Pure vectorized XLA (same brdf module
    as the oracle integrator).  Returns the advanced ray state."""
    (t, nsx, nsy, nsz, px, py, pz, mt, ar, ag, ab, mp,
     er, eg, eb, em) = rec
    zero = Vec3.zeros(t.shape)
    miss = t == INF
    take_bg = active & miss
    L = L + where(take_bg, T * bg, zero)
    active = active & ~miss

    ns = normalize(Vec3(nsx, nsy, nsz))
    wi = -dirn
    cos_view = dot(wi, ns)

    front_emit = active & (em > 0.0) & (cos_view > 0.0)
    L = L + where(front_emit, T * Vec3(er, eg, eb), zero)

    n = where(cos_view < 0.0, -ns, ns)

    state, u1 = rng.next_uniform(state)
    state, u2 = rng.next_uniform(state)
    state, u3 = rng.next_uniform(state)
    mat = brdf.MatLookup(mtype=mt, color=Vec3(ar, ag, ab), param=mp)
    wo, is_spec, weight = brdf.sample_brdf_from_uniforms(mat, n, wi,
                                                         u1, u2, u3)
    ev_value, ev_pdf = brdf.eval_brdf(mat, n, wi, wo)

    ok_spec = max_elem(weight) > 0.0
    ok_scatter = (max_elem(ev_value) > 0.0) & (ev_pdf > 0.0)
    pdf_safe = jnp.where(ev_pdf > 0.0, ev_pdf, 1.0)
    contrib = where(is_spec, weight, ev_value * (1.0 / pdf_safe))
    ok = jnp.where(is_spec, ok_spec, ok_scatter)

    upd = active & ok
    T = where(upd, T * contrib, T)
    active = active & ok

    org = where(active, Vec3(px, py, pz), org)
    dirn = where(active, wo, dirn)

    state, ru = rng.next_uniform(state)
    rr_on = depth > rr_start_depth
    p = jnp.maximum(0.5, 1.0 - max_elem(T))
    kill = rr_on & (ru < p)
    scale = 1.0 / jnp.where(rr_on & ~kill & (p < 1.0), 1.0 - p, 1.0)
    T = where(active & rr_on & ~kill, T * scale, T)
    active = active & ~kill

    active = active & (depth + 1 < max_depth)
    return org, dirn, T, L, active, state


def _wave_layout(width: int, height: int):
    """Static slot -> pixel map: each [WAVE_ROWS,128] packet covers one
    compact TILE screen tile (same swizzle as the brick kernel).  Padding
    slots (off-image) get pixel id R = width*height."""
    tw, th = TILE
    n_blocks = tile_grid(width, height, TILE)
    tiles_x = -(-width // tw)
    blk = np.arange(n_blocks)[:, None, None]
    rowid = np.arange(WAVE_ROWS)[None, :, None]
    laneid = np.arange(LANES)[None, None, :]
    ii = (blk % tiles_x) * tw + laneid % tw
    jj = (blk // tiles_x) * th + rowid * (LANES // tw) + laneid // tw
    valid = (ii < width) & (jj < height)
    pix = np.where(valid, jj * width + ii, width * height)
    return pix.reshape(-1).astype(np.int32), n_blocks


@partial(jax.jit, static_argnames=("width", "height", "num_samples", "seed",
                                   "max_depth", "S", "interpret",
                                   "rr_start_depth", "sort_mode", "trace",
                                   "compact_tail", "tail_trace"))
def _render_wavefront(sph_rows, top_boxes, top_links, brick_data, cam_data,
                      bg, scene_lo, scene_inv, pix_slots, sample_start,
                      width: int, height: int, num_samples: int, seed: int,
                      max_depth: int, S: int, interpret: bool = False,
                      rr_start_depth: int = RR_START_DEPTH,
                      sort_mode: str = "mort_oct", num_real=None,
                      light_rows=None, brick_lo=None, brick_hi=None,
                      trace: str = "pairs", coarse_rows=None,
                      compact_tail: int = 8, tail_trace: str = ""):
    R = width * height
    n_slots = pix_slots.shape[0]
    bg3 = Vec3(bg[0], bg[1], bg[2])

    # rays = all samples of this launch over all slots, packet-major
    pix = jnp.tile(pix_slots, num_samples)
    samp = jnp.repeat(jnp.arange(num_samples, dtype=jnp.uint32), n_slots)
    rows = (n_slots * num_samples) // LANES
    shape = (rows, LANES)
    pix2 = pix.reshape(shape)
    valid = pix2 < R
    if num_real is not None:
        # sample-sharded chips run the same static num_samples passes but
        # only the first num_real are real (parallel/sharding.py)
        valid = valid & (samp.reshape(shape) < num_real.astype(jnp.uint32))

    state = rng.seed_rays(pix2.astype(jnp.uint32),
                          sample_start + samp.reshape(shape), seed)
    state, u1 = rng.next_uniform(state)
    state, u2 = rng.next_uniform(state)
    i = (pix2 % width).astype(jnp.float32)
    j = (pix2 // width).astype(jnp.float32)
    u = (i + u1) / width
    v = (j + u2) / height
    org, dirn = camera_rays(cam_data, u, v)

    T = Vec3.full(shape, (1.0, 1.0, 1.0))
    L = Vec3.zeros(shape)
    active = valid

    # flattened prim-record table for winner-attribute recovery: prim slot
    # brick*BRICK_PRIMS+k is row slot of this [B*512, 32] view
    # (models/bricks.py layout docs); computed once, hoisted out of the
    # bounce loop by XLA
    tri_rows = brick_data[:, :BRICK_DATA_ROWS, :].reshape(-1, 32)

    def trace_tri(tnear, org, dirn, act_f, engine):
        """(t, slot) closest triangle hit for one wave, by the selected
        tracer: 'pairs[N]' = XLA visit lists + flat Pallas pair grid
        (ops/pairtrace.py, N = rows per packet), 'slim[N]' = scalar-walk
        brick kernel (N-row packets, default WAVE_ROWS), 'slimg[N]' =
        slim with N-row sub-packet chunk gating, 'slim2' = DMA-pipelined
        walk."""
        if engine.startswith("pairs"):
            pr = int(engine[5:]) if len(engine) > 5 else None
            return trace_wave_pairs(
                brick_data, brick_lo, brick_hi, tnear,
                org.x, org.y, org.z, dirn.x, dirn.y, dirn.z, act_f,
                interpret=interpret,
                **({} if pr is None else {"packet_rows": pr}))
        if engine == "slim2":
            return _trace_wave_slim2(
                top_boxes, top_links, brick_data, tnear,
                org.x, org.y, org.z, dirn.x, dirn.y, dirn.z, act_f,
                interpret=interpret)
        gr = pr = 0
        if engine.startswith("slimg"):
            gr = int(engine[5:]) if len(engine) > 5 else 8
        elif engine.startswith("slim") and len(engine) > 4:
            pr = int(engine[4:])
        return _trace_wave_slim(
            sph_rows, top_boxes, top_links, brick_data, tnear,
            org.x, org.y, org.z, dirn.x, dirn.y, dirn.z, act_f, S,
            interpret=interpret, group_rows=gr, packet_rows=pr)

    def trace_shade(org, dirn, T, L, active, state, depth, tnear,
                    engine):
        act_f = jnp.where(active, 1.0, 0.0)
        t, slot = trace_tri(tnear, org, dirn, act_f, engine)
        rec = _record_from_slots(tri_rows, sph_rows, S, t, slot, org,
                                 dirn, tnear, active)
        if light_rows is not None:
            def shadow_t(sorg, sdir, mask):
                st_, _ = trace_tri(SECONDARY_TNEAR, sorg, sdir,
                                   jnp.where(mask, 1.0, 0.0), engine)
                return _sphere_tmin(sph_rows, S, sorg, sdir,
                                    SECONDARY_TNEAR, st_)
            L = L + _nee_term(rec, dirn, T, active, light_rows, shadow_t)
        return _shade(rec, org, dirn, T, L, active, state, depth, bg3,
                      rr_start_depth, max_depth)

    # wave 0: tile-coherent camera rays, no sort
    org, dirn, T, L, active, state = trace_shade(
        org, dirn, T, L, active, state, jnp.int32(0), 0.0, trace)

    def sort_state(st, shp):
        """One fused live-to-front coherence sort of the 15-column ray SoA
        (key = sig_mort / mort_oct; dead rays sink to the tail)."""
        (active, depth, ox, oy, oz, dx, dy, dz, Tx, Ty, Tz,
         Lx, Ly, Lz, pixc, state) = st
        org, dirn = Vec3(ox, oy, oz), Vec3(dx, dy, dz)
        if sort_mode == "sig_mort":
            key = _sig_key(org, dirn, active, scene_lo, scene_inv,
                           coarse_rows)
        elif sort_mode == "sig_oct":
            key = _sig_key(org, dirn, active, scene_lo, scene_inv,
                           coarse_rows, octant=True)
        else:
            key = _sort_key(org, dirn, active, scene_lo, scene_inv)
        flat = lambda a: a.reshape(-1)
        cols = lax.sort(
            (flat(key), flat(ox), flat(oy), flat(oz), flat(dx),
             flat(dy), flat(dz), flat(Tx), flat(Ty), flat(Tz),
             flat(Lx), flat(Ly), flat(Lz), flat(pixc), flat(state),
             flat(jnp.where(active, 1.0, 0.0))),
            num_keys=1)
        (ox, oy, oz, dx, dy, dz, Tx, Ty, Tz, Lx, Ly, Lz, pixc,
         state, act_f) = (c.reshape(shp) for c in cols[1:])
        return (act_f > 0.0, depth, ox, oy, oz, dx, dy, dz,
                Tx, Ty, Tz, Lx, Ly, Lz, pixc, state)

    def make_bounce(shp, engine):
        """cond/body of the bounce loop for a [shp] ray buffer."""
        def cond(st):
            return jnp.any(st[0]) & (st[1] < max_depth)

        def body(st):
            if sort_mode != "none":
                st = sort_state(st, shp)
            (active, depth, ox, oy, oz, dx, dy, dz, Tx, Ty, Tz,
             Lx, Ly, Lz, pixc, state) = st
            org, dirn = Vec3(ox, oy, oz), Vec3(dx, dy, dz)
            T, L = Vec3(Tx, Ty, Tz), Vec3(Lx, Ly, Lz)
            org, dirn, T, L, active, state = trace_shade(
                org, dirn, T, L, active, state, depth, SECONDARY_TNEAR,
                engine)
            return (active, depth + 1, org.x, org.y, org.z,
                    dirn.x, dirn.y, dirn.z, T.x, T.y, T.z, L.x, L.y, L.z,
                    pixc, state)

        return cond, body

    st = (active, jnp.int32(1), org.x, org.y, org.z, dirn.x, dirn.y,
          dirn.z, T.x, T.y, T.z, L.x, L.y, L.z, pix2, state)
    cond_f, body_f = make_bounce(shape, trace)

    # the ladder's chunk cutoff (c*K*LANES < live) assumes live rays are
    # a sorted prefix; without a sort it would skip live rays in later
    # chunks, so "none" keeps the plain full-size loop
    if sort_mode == "none":
        compact_tail = 0

    if not compact_tail:
        st = lax.while_loop(cond_f, body_f, st)
        Lx, Ly, Lz, pixc = st[11], st[12], st[13], st[14]
    else:
        # Compaction ladder (r5): the full-size loop pays dense shade +
        # sort + a mostly-dead trace grid at EVERY depth even when <1% of
        # rays survive (probe_r5: shade ~21 ms and sort ~5 ms per wave,
        # dead packets 50 us each, out to depth ~10+).  Instead: run wave
        # 1 full-size, then sort live rays to the front ONCE and bounce
        # the survivors in chunks of rows/compact_tail rows — each chunk
        # runs its own bounce loop to extinction at 1/compact_tail of the
        # dense cost.  The chunk count adapts to the real live count (an
        # all-alive scene simply processes every chunk), so this is a
        # pure restructuring: every ray still bounces to the same depth
        # with the same RNG stream, and the final segment_sum is over the
        # same (L, pixel) pairs.
        st = lax.cond(cond_f(st), body_f, lambda s: s, st)       # wave 1
        st = sort_state(st, shape) if sort_mode != "none" else st
        (active, depth2, ox, oy, oz, dx, dy, dz, Tx, Ty, Tz,
         Lx, Ly, Lz, pixc, state) = st
        act_f = jnp.where(active, 1.0, 0.0)
        live = jnp.sum(act_f.astype(jnp.int32))

        K = max(rows // compact_tail, WAVE_ROWS)
        K = -(-K // WAVE_ROWS) * WAVE_ROWS
        n_chunks = -(-rows // K)
        rows_pad = n_chunks * K
        pad = rows_pad - rows

        def padded(a, fill=0.0):
            if pad == 0:
                return a
            return jnp.concatenate(
                [a, jnp.full((pad, LANES), fill, a.dtype)], axis=0)

        cols_full = [padded(c) for c in
                     (ox, oy, oz, dx, dy, dz, Tx, Ty, Tz, state, act_f)]
        # padding rays: dead, sentinel pixel R (masked out of segment_sum)
        L_full = [padded(c) for c in (Lx, Ly, Lz)]
        pix_full = padded(pixc, R)

        cnd_c, bdy_c = make_bounce((K, LANES), tail_trace or trace)

        def chunk_cond(carry):
            c = carry[0]
            return (c < n_chunks) & (c * K * LANES < live)

        def chunk_body(carry):
            c, Lx_f, Ly_f, Lz_f, pix_f = carry
            r0 = c * K
            sl = lambda a: lax.dynamic_slice(a, (r0, 0), (K, LANES))
            (oxc, oyc, ozc, dxc, dyc, dzc, Txc, Tyc, Tzc, stc,
             afc) = (sl(a) for a in cols_full)
            stc2 = (afc > 0.0, depth2, oxc, oyc, ozc, dxc, dyc, dzc,
                    Txc, Tyc, Tzc, sl(Lx_f), sl(Ly_f), sl(Lz_f),
                    sl(pix_f), stc)
            out = lax.while_loop(cnd_c, bdy_c, stc2)
            upd = lambda f, v: lax.dynamic_update_slice(f, v, (r0, 0))
            return (c + 1, upd(Lx_f, out[11]), upd(Ly_f, out[12]),
                    upd(Lz_f, out[13]), upd(pix_f, out[14]))

        _, Lx, Ly, Lz, pixc = lax.while_loop(
            chunk_cond, chunk_body,
            (jnp.int32(0), L_full[0], L_full[1], L_full[2], pix_full))

    img = jnp.stack([
        jax.ops.segment_sum(c.reshape(-1), pixc.reshape(-1),
                            num_segments=R + 1)[:R]
        for c in (Lx, Ly, Lz)], axis=-1)
    return img.reshape(height, width, 3)


def camera_rays(cam_data, u, v):
    from .camera import generate_primary_rays
    return generate_primary_rays(cam_data, u, v)


def render_samples_wavefront(brickset: BrickSet, cam_data, width: int,
                             height: int, sample_start,
                             num_samples: int = 1, seed: int = 1984,
                             max_depth: int = MAX_DEPTH,
                             interpret: bool = False,
                             rr_start_depth: int = RR_START_DEPTH,
                             sort_mode: str = "sig_mort",
                             nee: bool = False, trace: str = "slim",
                             compact_tail: int = 8, tail_trace: str = ""):
    """Large-scene drop-in for ops.integrator.render_samples: the radiance
    SUM of ``num_samples`` passes, [H,W,3].  Sample batches too big for one
    wave render in chunks (shapes stay static per chunk size).
    ``nee=True`` samples point lights at every hit with shadow waves.
    ``trace`` picks the per-wave closest-hit engine: "slim" (the
    scalar-walk brick kernel — the default and measured winner,
    utils/config.py::RenderConfig.wavefront_trace), "slim2" (the same
    walk with a two-slot DMA pipeline) or "pairs[N]" (XLA visit lists +
    flat Pallas pair grid, ops/pairtrace.py, optional N = rows per
    packet); ``sort_mode`` the inter-wave coherence key ("sig_mort"
    target-signature default, "mort_oct" r3 key, "none")."""
    light_rows = None
    if nee and int(brickset.light_pos.shape[0]) > 0:
        light_rows = jnp.concatenate(
            [jnp.asarray(brickset.light_pos, jnp.float32),
             jnp.asarray(brickset.light_intensity, jnp.float32)], axis=1)
    bg = jnp.stack([jnp.asarray(brickset.bg_r), jnp.asarray(brickset.bg_g),
                    jnp.asarray(brickset.bg_b)])
    # scene box = top-tree root node (node 0: row 0, cols 0..5).  jnp ops so
    # this also traces when the BrickSet is a jit argument (ProgressiveRenderer
    # runs this inside _accumulate_step).
    root = jnp.asarray(brickset.top_boxes)[0, :6].astype(jnp.float32)
    lo, hi = root[:3], root[3:]
    inv = 1.0 / jnp.maximum(hi - lo, 1e-12)
    pix_slots, _ = _wave_layout(width, height)
    n_slots = pix_slots.shape[0]

    chunk = max(1, MAX_RAYS_PER_WAVE // n_slots)
    acc = None
    done = 0
    while done < num_samples:
        ns = min(chunk, num_samples - done)
        out = _render_wavefront(
            brickset.sph_rows, brickset.top_boxes, brickset.top_links,
            brickset.brick_data, cam_data, bg, jnp.asarray(lo),
            jnp.asarray(inv), jnp.asarray(pix_slots),
            jnp.asarray(sample_start, jnp.uint32) + jnp.uint32(done),
            width, height, ns, seed, max_depth, brickset.num_spheres,
            interpret=interpret, rr_start_depth=rr_start_depth,
            sort_mode=sort_mode, light_rows=light_rows,
            brick_lo=jnp.asarray(brickset.brick_lo),
            brick_hi=jnp.asarray(brickset.brick_hi), trace=trace,
            coarse_rows=jnp.asarray(brickset.coarse_boxes),
            compact_tail=compact_tail, tail_trace=tail_trace)
        acc = out if acc is None else acc + out
        done += ns
    return acc
