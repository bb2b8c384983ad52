"""Pair-list flat-grid brick tracer: traversal decisions in XLA, a
uniform Pallas grid for the intersection work.

Round-3 attribution (PERFLOG.md) measured the slim-walk brick kernel
(ops/brickkernel.py) to be bound NOT by triangle math but by dynamic
per-packet control flow: the scalar SMEM tree walk (~24 ms/wave with the
tri loop AND the brick DMA deleted), the per-node vector->scalar ``any()``
reduces, and the serialized ``start(); wait()`` DMA at every leaf visit.
None of that is intersection work — it is traversal DECISION work, and a
TPU makes those decisions far faster as dense vector math in XLA than as
scalar-core branching inside a kernel.

So this module splits the closest-hit query the TPU way:

  1. XLA computes each packet's brick visit list: the conservative
     interval cull of the packet's origin box + direction bounds against
     ALL brick AABBs at once ([P, B] elementwise, no tree — the same cull
     the MX tracer uses), then one ``lax.sort`` orders the surviving
     (packet, brick) pairs packet-major, near-brick-first.
  2. A Pallas kernel runs the pairs as a FLAT grid, one grid step per
     pair: ray blocks and hit accumulators arrive via scalar-prefetch
     indexed BlockSpecs, and each pair's 512-triangle brick streams
     HBM -> SMEM through a two-slot DMA pipeline that always fetches pair
     i+1 while pair i computes.  No stack, no per-node reduces, no
     serialized DMA — the only remaining per-pair control flow is the
     16 sub-AABB chunk culls that gate the triangle loop.

Best-t forward progress survives because pairs are ordered near-first
within each packet and every chunk's slab test prunes against the running
best (``tn <= t_best``), exactly like the depth-ordered walk it replaces.
Results are the (t, slot) contract of ``wavefront._trace_wave_slim``;
winner attributes are recovered by the shared XLA epilogue
(``wavefront._record_from_slots``).  Slot ids ride i32 end-to-end, so the
f32 2^24 slot limit of the slim walk does not apply here.

Semantics: the same closest hit as scene.h:246-301 computes per GPU
thread; parity vs the walk kernel and the XLA oracle is asserted in
tests/test_pairtrace.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.bricks import (BRICK_DATA_ROWS, BRICK_PRIMS, BRICK_ROWS,
                             NUM_SUBS, SUB_PRIMS)
from .brickkernel import _TRI_UNROLL
from .integrator import LANES
from .megakernel import _tri_test
from .vec import Vec3

INF = float("inf")

# Perf-attribution switch (tools/probe_pairs.py): "tri" drops the
# per-triangle loop, "" is production.  Renders are WRONG under the skip.
import os as _os
import sys as _sys
_PAIR_SKIP = _os.environ.get("PT_PAIR_SKIP", "")
if _PAIR_SKIP:
    print(f"WARNING: PT_PAIR_SKIP={_PAIR_SKIP!r} is set — the pair tracer "
          "will skip work and RENDER WRONG IMAGES (perf attribution only).",
          file=_sys.stderr)

# Rays per packet: PACKET_ROWS x 128 rays share one visit list.  With the
# walk gone, packet size trades cull tightness (smaller = fewer bricks per
# packet) against per-pair fixed cost amortization (larger = fewer pairs).
PACKET_ROWS = 32
# Pairs per kernel launch.  A wave's pair list is processed in chunks of
# this size inside a while_loop, so arbitrarily long visit lists stay
# exact; only the LAST chunk carries padding pairs, and padding costs one
# near-empty grid step each (no DMA, no compute).
PAIR_CAP = 4096


# ---------------------------------------------------------------------------
# Stage 1 (XLA): conservative packet-frustum vs brick-AABB interval cull
# (moved here from ops/mxtrace.py, which re-exports it — the MX tracer and
# the pair tracer share this exact cull)
# ---------------------------------------------------------------------------

def _minmax_masked(a, active, lo_fill=INF, hi_fill=-INF):
    lo = jnp.min(jnp.where(active, a, lo_fill), axis=1)
    hi = jnp.max(jnp.where(active, a, hi_fill), axis=1)
    return lo, hi


def _interval_cull(org: Vec3, dirn: Vec3, active, brick_lo, brick_hi,
                   tnear: float):
    """Conservative entry-distance lower bounds [M, B]; inf = certainly no
    ray of packet m hits brick b.  Packets are the rows of the [M, K] ray
    SoA (K = rays per packet).  Interval arithmetic over the packet's
    origin box and direction bounds; axes whose direction interval spans
    zero contribute no constraint (conservative)."""
    LB = None
    UB = None
    pk_live = jnp.any(active, axis=1)
    for o, d, ax in ((org.x, dirn.x, 0), (org.y, dirn.y, 1),
                     (org.z, dirn.z, 2)):
        olo, ohi = _minmax_masked(o, active)
        dlo, dhi = _minmax_masked(d, active)
        olo, ohi = olo[:, None], ohi[:, None]          # [M,1]
        same = (dlo * dhi > 0.0)[:, None]
        # 1/d is monotone on a sign-definite interval: r in [1/dhi, 1/dlo]
        rlo = (1.0 / jnp.where(dlo * dhi > 0.0, dhi, 1.0))[:, None]
        rhi = (1.0 / jnp.where(dlo * dhi > 0.0, dlo, 1.0))[:, None]
        blo = brick_lo[None, :, ax]                    # [1,B]
        bhi = brick_hi[None, :, ax]

        def pint(nlo, nhi):
            p0, p1, p2, p3 = nlo * rlo, nlo * rhi, nhi * rlo, nhi * rhi
            return (jnp.minimum(jnp.minimum(p0, p1), jnp.minimum(p2, p3)),
                    jnp.maximum(jnp.maximum(p0, p1), jnp.maximum(p2, p3)))

        l0, h0 = pint(blo - ohi, blo - olo)            # near-plane times
        l1, h1 = pint(bhi - ohi, bhi - olo)            # far-plane times
        axlo = jnp.minimum(l0, l1)    # <= every ray's slab entry
        axhi = jnp.maximum(h0, h1)    # >= every ray's slab exit
        axlo = jnp.where(same, axlo, -INF)
        axhi = jnp.where(same, axhi, INF)
        LB = axlo if LB is None else jnp.maximum(LB, axlo)
        UB = axhi if UB is None else jnp.minimum(UB, axhi)
    ok = (jnp.maximum(LB, tnear) <= UB) & (UB >= 0.0) & pk_live[:, None]
    return jnp.where(ok, jnp.maximum(LB, 0.0), INF)


def _pack_pairs(lb):
    """Flatten the [P, B] entry-bound matrix into a packet-major,
    near-brick-first pair list.  Returns (pkt [P*B] i32 with P as the
    invalid sentinel, brk [P*B] i32, ent [P*B] f32 conservative entry
    lower bounds, count i32)."""
    P, B = lb.shape
    valid = jnp.isfinite(lb)
    pkt = jax.lax.broadcasted_iota(jnp.int32, (P, B), 0)
    brk = jax.lax.broadcasted_iota(jnp.int32, (P, B), 1)
    pkt_key = jnp.where(valid, pkt, jnp.int32(P))   # sentinel sinks to tail
    pkt_s, ent_s, brk_s = lax.sort(
        (pkt_key.reshape(-1), lb.reshape(-1), brk.reshape(-1)), num_keys=2)
    count = jnp.sum(valid.astype(jnp.int32))
    return pkt_s, brk_s, ent_s, count


# ---------------------------------------------------------------------------
# Stage 2 (Pallas): flat pair grid
# ---------------------------------------------------------------------------

def _make_pair_kernel(tnear: float):
    """One grid step per (packet, brick) pair.  Scalar-prefetch arrays:
    pkt [CAP] (block index of the pair's ray/accumulator windows),
    brk [CAP+1] (-1 = padding; entry i+1 drives the DMA prefetch),
    first [CAP] (1 = first pair of its packet in this launch -> seed the
    output accumulators from the carried-in state)."""

    def kernel(pkt_ref, brk_ref, first_ref, ent_ref, ox, oy, oz, dx, dy,
               dz, act, t_in, s_in, bricks_hbm, out_t, out_s, scratch,
               sems):
        i = pl.program_id(0)
        brick = brk_ref[i]
        slot = lax.rem(i, 2)

        def dma(j, sl):
            b = jnp.maximum(brk_ref[j], 0)
            return pltpu.make_async_copy(bricks_hbm.at[b], scratch.at[sl],
                                         sems.at[sl])

        # warm-up: pair 0's brick has no prior step to prefetch it
        @pl.when((i == 0) & (brick >= 0))
        def _():
            dma(0, 0).start()

        # pipeline: fetch pair i+1's brick while this pair computes
        # (brk_ref has CAP+1 entries; the pad entry is -1)
        @pl.when(brk_ref[i + 1] >= 0)
        def _():
            dma(i + 1, lax.rem(i + 1, 2)).start()

        # seed the accumulators at each packet's first pair of this launch
        @pl.when(first_ref[i] == 1)
        def _():
            out_t[:] = t_in[:]
            out_s[:] = s_in[:]

        def _pair_body(active):
            org = Vec3(ox[:], oy[:], oz[:])
            dirn = Vec3(dx[:], dy[:], dz[:])
            inv = Vec3(1.0 / dirn.x, 1.0 / dirn.y, 1.0 / dirn.z)

            def rd(kk, j):
                return scratch[slot, kk // 4, (kk % 4) * 32 + j]

            def rdv(kk, j) -> Vec3:
                return Vec3(rd(kk, j), rd(kk, j + 1), rd(kk, j + 2))

            def tri_body(k, best):
                p0, e1, e2 = rdv(k, 1), rdv(k, 4), rdv(k, 7)
                bt, bs = best
                t, _u, _v, hit = _tri_test(p0, e1, e2, org, dirn, tnear, bt)
                closer = hit & (t < bt)
                sl = brick * BRICK_PRIMS + k
                return (jnp.where(closer, t, bt), jnp.where(closer, sl, bs))

            def sub_body(s, best):
                c = s * 8
                smn = Vec3(scratch[slot, BRICK_DATA_ROWS, c],
                           scratch[slot, BRICK_DATA_ROWS, c + 1],
                           scratch[slot, BRICK_DATA_ROWS, c + 2])
                smx = Vec3(scratch[slot, BRICK_DATA_ROWS, c + 3],
                           scratch[slot, BRICK_DATA_ROWS, c + 4],
                           scratch[slot, BRICK_DATA_ROWS, c + 5])
                valid_c = scratch[slot, BRICK_DATA_ROWS, c + 6] > 0.0
                tx0 = (smn.x - org.x) * inv.x
                tx1 = (smx.x - org.x) * inv.x
                ty0 = (smn.y - org.y) * inv.y
                ty1 = (smx.y - org.y) * inv.y
                tz0 = (smn.z - org.z) * inv.z
                tz1 = (smx.z - org.z) * inv.z
                tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                             jnp.minimum(ty0, ty1)),
                                 jnp.minimum(tz0, tz1))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                             jnp.maximum(ty0, ty1)),
                                 jnp.maximum(tz0, tz1))
                hitm = ((tf >= jnp.maximum(tn, 0.0)) & (tn <= best[0])
                        & active)
                anyhit = jnp.any(hitm) & valid_c
                if _PAIR_SKIP == "tri":
                    return (best[0] + jnp.where(anyhit, 0.0, 0.0), best[1])
                return lax.cond(
                    anyhit,
                    lambda b: lax.fori_loop(
                        0, SUB_PRIMS,
                        lambda k, bb: tri_body(s * SUB_PRIMS + k, bb),
                        b, unroll=_TRI_UNROLL),
                    lambda b: b, best)

            best = lax.fori_loop(0, NUM_SUBS, sub_body,
                                 (out_t[:], out_s[:]))
            out_t[:] = best[0]
            out_s[:] = best[1]

        @pl.when(brick >= 0)
        def _():
            dma(i, slot).wait()
            active = act[:] > 0.0
            # near-first early-out (the walk's best-t subtree prune,
            # reproduced on the flat list): ent is a lower bound of every
            # ray's entry into this brick, so if no live ray's running
            # best-t exceeds it, nothing here can win — skip the pair for
            # the cost of one reduce.
            proceed = jnp.any((out_t[:] > ent_ref[i]) & active)

            @pl.when(proceed)
            def _():
                _pair_body(active)

    return kernel


def _pair_chunk(pkt, brk_ext, first, ent, t, slot, ox, oy, oz, dx, dy, dz,
                act, brick_data, tnear: float, cap: int,
                interpret: bool = False, packet_rows: int = PACKET_ROWS):
    """One ``cap``-pair kernel launch; returns updated (t, slot) for the
    packets this chunk visited (unvisited packets' rows are GARBAGE — the
    caller merges with its visited mask)."""
    rows = ox.shape[0]
    ray_spec = pl.BlockSpec((packet_rows, LANES),
                            lambda i, pkt, brk, first, ent: (pkt[i], 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(cap,),
        in_specs=[ray_spec] * 9 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(ray_spec, ray_spec),
        scratch_shapes=[pltpu.SMEM((2, BRICK_ROWS, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    out_shape = (jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((rows, LANES), jnp.int32))
    return pl.pallas_call(
        _make_pair_kernel(tnear),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(pkt, brk_ext, first, ent, ox, oy, oz, dx, dy, dz, act, t, slot,
      brick_data)


def trace_wave_pairs(brick_data, brick_lo, brick_hi, tnear: float,
                     ox, oy, oz, dx, dy, dz, act,
                     interpret: bool = False,
                     packet_rows: int = PACKET_ROWS):
    """Closest-hit over the brick soup for one wave of [rows, 128] rays
    (rows a multiple of ``packet_rows``).  Drop-in for
    ``wavefront._trace_wave_slim``: returns (t [rows,128] f32 with inf =
    no triangle hit, slot [rows,128] i32 with -1 = no triangle hit).
    Spheres are NOT included — the caller's epilogue folds them in."""
    rows = ox.shape[0]
    # small waves (tests, tail chunks) clamp the packet to the wave
    packet_rows = min(packet_rows, rows)
    assert rows % packet_rows == 0, (rows, packet_rows)
    P = rows // packet_rows
    B = int(brick_data.shape[0])
    rp = lambda a: a.reshape(P, packet_rows * LANES)

    lb = _interval_cull(Vec3(rp(ox), rp(oy), rp(oz)),
                        Vec3(rp(dx), rp(dy), rp(dz)),
                        rp(act) > 0.0, brick_lo, brick_hi, tnear)
    pkt_s, brk_s, ent_s, count = _pack_pairs(lb)

    # chunk size: small scenes fit their whole P x B matrix in one launch
    # (also keeps interpret-mode tests fast); big waves loop PAIR_CAP at a
    # time and only the last chunk carries padding
    cap = min(PAIR_CAP, -(-(P * B) // 8) * 8)
    pad = (-(P * B)) % cap
    if pad:
        pkt_s = jnp.concatenate([pkt_s, jnp.full((pad,), P, jnp.int32)])
        brk_s = jnp.concatenate([brk_s, jnp.zeros((pad,), jnp.int32)])
        ent_s = jnp.concatenate([ent_s, jnp.zeros((pad,), jnp.float32)])

    t0 = jnp.full((rows, LANES), INF, jnp.float32)
    s0 = jnp.full((rows, LANES), -1, jnp.int32)

    def cond(st):
        return st[0] * cap < count

    def body(st):
        c, t, slot = st
        pk = lax.dynamic_slice(pkt_s, (c * cap,), (cap,))
        bk = lax.dynamic_slice(brk_s, (c * cap,), (cap,))
        en = lax.dynamic_slice(ent_s, (c * cap,), (cap,))
        bk = jnp.where(pk >= P, -1, bk)
        pkc = jnp.minimum(pk, P - 1)
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), pkc[:-1]])
        first = (pkc != prev).astype(jnp.int32)
        bk_ext = jnp.concatenate([bk, jnp.full((1,), -1, jnp.int32)])
        t2, s2 = _pair_chunk(pkc, bk_ext, first, en, t, slot,
                             ox, oy, oz, dx, dy, dz, act,
                             brick_data, tnear, cap, interpret,
                             packet_rows)
        vis = jnp.zeros((P,), jnp.bool_).at[pk].set(True, mode="drop")
        vrow = jnp.repeat(vis, packet_rows)[:, None]
        return (c + 1,
                jnp.where(vrow, t2, t),
                jnp.where(vrow, s2, slot))

    _, t, slot = lax.while_loop(cond, body, (jnp.int32(0), t0, s0))
    return t, slot
