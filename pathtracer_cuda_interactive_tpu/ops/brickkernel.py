"""Pallas brick tracer: large triangle scenes without per-lane gathers.

The GPU traversal the reference uses (scene.h:246-301: per-thread stack,
divergent node fetches) is built on an op TPU vector lanes do not have —
per-lane random access.  This kernel restructures the same closest-hit
query around the units the TPU does have:

  * the SCALAR core walks a small skip-link BVH over brick AABBs
    (models/bricks.py) that lives entirely in SMEM — one cursor per ray
    *packet* (the whole [block_rows, 128] tile), advanced by
    descend/skip decisions reduced from the packet's vectorized slab test;
  * a DMA engine streams each visited leaf's brick — BRICK_PRIMS (512)
    Morton-ordered triangles as one dense [BRICK_ROWS, 128] f32 block
    (136 rows: 128 of prim records + the sub-AABB row, models/bricks.py)
    — HBM -> SMEM;
  * the VPU brute-forces the packet against the brick with the same
    zero-gather scalar-record loop the small-scene megakernel uses.

The packet pays the UNION of its rays' traversal (lockstep cost — SURVEY.md
§7 hard part 1); Morton-ordered bricks + screen-tiled packets keep that
union small for primary rays, and the persistent-lane shell
(ops/megakernel.py::make_persistent_kernel) keeps dead lanes working.

Spheres are not bricked; the handful in scope stays resident in SMEM and
is brute-forced first (same math as the megakernel, so parity holds).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.bricks import (BRICK_DATA_ROWS, BRICK_PRIMS, BRICK_ROWS,
                             NUM_SUBS, STACK_DEPTH, SUB_PRIMS, BrickSet)
from . import rng
from .integrator import LANES, MAX_DEPTH
from .megakernel import (_scalar, _svec, make_persistent_kernel,
                         _sphere_test, _tri_test, tile_grid,
                         tile_permutation)
from .vec import Vec3, cross

# Packet height: rows per grid block.  Smaller packets pay a smaller
# traversal union per ray but amortize scalar/DMA overhead over fewer
# lanes; 16 rows = 2048 rays is the sweet spot measured on v5e.
BLOCK_ROWS = 16
# Compact screen tile per packet (64x32 px).  A row-major band of the same
# 2048 lanes is 640x3.2 px — its frustum sweeps most of the scene and the
# packet pays that union; the compact tile cuts visited bricks several-fold.
TILE = (64, 32)
INF = float("inf")

# Perf-attribution switch (tools/bench_wavefront.py): "tri" drops the
# per-triangle loop, "dma" drops the brick fetch, "" is production.
# Renders are WRONG under either skip; never set outside microbenches.
import os as _os
import sys as _sys
_DEBUG_SKIP = _os.environ.get("PT_DEBUG_SKIP", "")
# Unroll of the 32-tri inner loops and the 16-chunk gate loop around
# them (Mosaic supports only 1 or the full trip count).  Full unroll
# removes per-iteration loop bookkeeping and lets the scalar record
# reads run ahead of the vector math — measured bunny full-frame
# 0.973 -> 1.295 Msamples/s (tri) -> 1.498 (tri+chunk at 16-row
# packets), r5.  Only meaningful under Mosaic: the CPU interpret path
# (tests) keeps rolled loops, where 512 inlined triangle bodies would
# just multiply trace time.  Env-overridable for attribution runs.
def _default_unroll(var: str, full: str) -> int:
    import jax
    dflt = full if jax.default_backend() == "tpu" else "1"
    return int(_os.environ.get(var, dflt))


_TRI_UNROLL = _default_unroll("PT_TRI_UNROLL", "32")
_SUB_UNROLL = _default_unroll("PT_SUB_UNROLL", "16")
if _DEBUG_SKIP:
    print(f"WARNING: PT_DEBUG_SKIP={_DEBUG_SKIP!r} is set — brick-tracer "
          "kernels will skip work and RENDER WRONG IMAGES.  This switch "
          "exists only for perf attribution (tools/bench_wavefront.py); "
          "unset it for any real render.", file=_sys.stderr)


def _brick_scalar(scratch, k, j):
    """Prim k (0..BRICK_PRIMS-1), float j (0..31) from the
    [BRICK_ROWS, 128] brick block (4 records of 32 floats per row)."""
    return scratch[k // 4, (k % 4) * 32 + j]


def _brick_svec(scratch, k, j) -> Vec3:
    return Vec3(_brick_scalar(scratch, k, j), _brick_scalar(scratch, k, j + 1),
                _brick_scalar(scratch, k, j + 2))


def _select16(best, closer, t, ns, pos, attrs):
    (bt, bnx, bny, bnz, bpx, bpy, bpz, bmt, bar, bag, bab, bmp,
     ber, beg, beb, bem) = best
    sel = lambda a, b: jnp.where(closer, a, b)
    mt, ar, ag, ab, mp, er, eg, eb, em = attrs
    return (sel(t, bt),
            sel(ns.x, bnx), sel(ns.y, bny), sel(ns.z, bnz),
            sel(pos.x, bpx), sel(pos.y, bpy), sel(pos.z, bpz),
            sel(mt, bmt), sel(ar, bar), sel(ag, bag), sel(ab, bab),
            sel(mp, bmp), sel(er, ber), sel(eg, beg), sel(eb, beb),
            sel(em, bem))


def _tri_slot_body(read_vec, k, brick, best, org, dirn, tnear):
    """Slim per-triangle test: track only (best_t, best_slot).  The ~50
    vector ops of attribute interpolation + 16-wide winner select in
    _tri_record_body run per TESTED triangle; this body spends ~30 ops and
    the attributes of the single WINNING slot are recovered afterwards in
    XLA by one gather (ops/wavefront.py::_record_from_slots).  slot =
    brick * BRICK_PRIMS + k, the row of the flattened prim-record table."""
    p0 = read_vec(k, 1)
    e1 = read_vec(k, 4)
    e2 = read_vec(k, 7)
    bt, bslot = best
    t, u, v, hit = _tri_test(p0, e1, e2, org, dirn, tnear, bt)
    closer = hit & (t < bt)
    slot = (brick * BRICK_PRIMS + k).astype(jnp.float32)
    return (jnp.where(closer, t, bt), jnp.where(closer, slot, bslot))


def _tri_record_body(read_vec, read_sc, k, best, org, dirn, tnear):
    """One triangle record test + winner-attribute select; shared layout
    with the megakernel rows (device_scene.py prim_rows docstring)."""
    p0 = read_vec(k, 1)
    e1 = read_vec(k, 4)
    e2 = read_vec(k, 7)
    bt = best[0]
    t, u, v, hit = _tri_test(p0, e1, e2, org, dirn, tnear, bt)
    closer = hit & (t < bt)
    w = 1.0 - u - v
    pos = Vec3(p0.x + e1.x * u + e2.x * v,
               p0.y + e1.y * u + e2.y * v,
               p0.z + e1.z * u + e2.z * v)
    n0 = read_vec(k, 10)
    n1 = read_vec(k, 13)
    n2 = read_vec(k, 16)
    ni = Vec3(n0.x * w + n1.x * u + n2.x * v,
              n0.y * w + n1.y * u + n2.y * v,
              n0.z * w + n1.z * u + n2.z * v)
    ng = cross(e1, e2)
    smooth = read_sc(k, 28) > 0.5
    ns = Vec3(jnp.where(smooth, ni.x, ng.x),
              jnp.where(smooth, ni.y, ng.y),
              jnp.where(smooth, ni.z, ng.z))
    attrs = tuple(read_sc(k, j) for j in (19, 20, 21, 22, 23, 24, 25, 26, 27))
    return _select16(best, closer, t, ns, pos, attrs)


def make_brick_intersect(sph_ref, boxes_ref, links_ref, bricks_ref,
                         scratch, stack_ref, sem, S: int,
                         collect_stats: bool = False, slim: bool = False,
                         group_rows: int = 0):
    """Build the packet closest-hit closure over the SMEM top tree + DMA'd
    bricks.  Shared by the persistent-lane kernel below and the one-bounce
    wavefront trace kernel (ops/wavefront.py).  The returned
    ``intersect(org, dirn, tnear, shape, active)`` matches the
    make_persistent_kernel contract (ops/megakernel.py).

    ``collect_stats=True`` appends a (nodes_stepped, bricks_processed,
    chunks_tested) i32 scalar triple to the return tuple — the per-packet
    traversal cost observability the perf work steers by
    (tools/kernel_stats.py)."""

    def intersect(org, dirn, tnear, shape, active):
        zero = jnp.zeros(shape, jnp.float32)
        if slim:
            # (best_t, best_slot) only; spheres + attributes are the
            # caller's XLA epilogue (wavefront._record_from_slots)
            best = (jnp.full(shape, INF, jnp.float32),
                    jnp.full(shape, -1.0, jnp.float32))
        else:
            best = (jnp.full(shape, INF, jnp.float32),) + (zero,) * 15

        # -- resident spheres (megakernel sphere_body semantics)
        def sphere_body(k, best):
            c = _svec(sph_ref, k, 1)
            r = _scalar(sph_ref, k, 4)
            bt = best[0]
            t, hit = _sphere_test(c, r, org, dirn, tnear, bt)
            closer = hit & (t < bt)
            pos = Vec3(org.x + dirn.x * t, org.y + dirn.y * t,
                       org.z + dirn.z * t)
            ns = Vec3(pos.x - c.x, pos.y - c.y, pos.z - c.z)
            attrs = tuple(_scalar(sph_ref, k, j)
                          for j in (19, 20, 21, 22, 23, 24, 25, 26, 27))
            return _select16(best, closer, t, ns, pos, attrs)

        if S > 0 and not slim:
            best = lax.fori_loop(0, S, sphere_body, best)

        # -- packet walk of the SMEM brick tree
        # per-axis safe reciprocal (slab test semantics match
        # geometry.slab_test: +/-inf propagates correctly)
        inv = Vec3(1.0 / dirn.x, 1.0 / dirn.y, 1.0 / dirn.z)

        def _slab_mask(bmin, bmax, t_best):
            """Per-lane slab-hit mask vs a scalar AABB, live lanes only."""
            tx0 = (bmin.x - org.x) * inv.x
            tx1 = (bmax.x - org.x) * inv.x
            ty0 = (bmin.y - org.y) * inv.y
            ty1 = (bmax.y - org.y) * inv.y
            tz0 = (bmin.z - org.z) * inv.z
            tz1 = (bmax.z - org.z) * inv.z
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                         jnp.maximum(ty0, ty1)),
                             jnp.maximum(tz0, tz1))
            return ((tf >= jnp.maximum(tn, 0.0)) & (tn <= t_best)
                    & active)

        def _slab_any(bmin, bmax, t_best):
            """Packet slab test vs a scalar AABB -> scalar any-hit."""
            return jnp.any(_slab_mask(bmin, bmax, t_best))

        def process_brick(st):
            brick_id = st[1]

            if slim:
                def tri_body(k, best):
                    return _tri_slot_body(
                        lambda kk, j: _brick_svec(scratch, kk, j),
                        k, brick_id, best, org, dirn, tnear)
            else:
                def tri_body(k, best):
                    return _tri_record_body(
                        lambda kk, j: _brick_svec(scratch, kk, j),
                        lambda kk, j: _brick_scalar(scratch, kk, j),
                        k, best, org, dirn, tnear)

            if slim and group_rows:
                # Sub-packet gating (r5): the whole-packet chunk gate runs
                # the 32-tri loop over ALL rows when ANY of the 4096 rays
                # needs the chunk — the measured r5 census puts the
                # tri-loop share of a divergent wave at ~70% with a ~50%
                # gate pass rate, i.e. most of that vector work serves a
                # minority of rows.  Here both the gate and the loop run
                # per ``group_rows``-row group: vector breadth follows the
                # rows that actually hit the chunk, at the cost of
                # re-reading the triangle scalars per live group.
                G = shape[0] // group_rows

                def sub_body(s, st):
                    chunks, best = st[0], st[2:]
                    c = s * 8
                    smn = Vec3(scratch[BRICK_DATA_ROWS, c],
                               scratch[BRICK_DATA_ROWS, c + 1],
                               scratch[BRICK_DATA_ROWS, c + 2])
                    smx = Vec3(scratch[BRICK_DATA_ROWS, c + 3],
                               scratch[BRICK_DATA_ROWS, c + 4],
                               scratch[BRICK_DATA_ROWS, c + 5])
                    valid = scratch[BRICK_DATA_ROWS, c + 6] > 0.0
                    hitm = _slab_mask(smn, smx, best[0]) & valid
                    bt, bslot = best
                    if _DEBUG_SKIP != "tri":
                        bts, bss = [], []
                        for g in range(G):
                            r0 = g * group_rows
                            gsl = slice(r0, r0 + group_rows)
                            go = Vec3(org.x[gsl], org.y[gsl], org.z[gsl])
                            gd = Vec3(dirn.x[gsl], dirn.y[gsl],
                                      dirn.z[gsl])
                            gtn = tnear[gsl]

                            def gtri(k, b, go=go, gd=gd, gtn=gtn):
                                return _tri_slot_body(
                                    lambda kk, j: _brick_svec(scratch, kk, j),
                                    k, brick_id, b, go, gd, gtn)

                            gb = lax.cond(
                                jnp.any(hitm[gsl]),
                                lambda b, gtri=gtri: lax.fori_loop(
                                    s * SUB_PRIMS, (s + 1) * SUB_PRIMS,
                                    gtri, b),
                                lambda b: b, (bt[gsl], bslot[gsl]))
                            bts.append(gb[0])
                            bss.append(gb[1])
                        # Mosaic has no dynamic_update_slice on values;
                        # aligned static slices + one concat lower fine
                        bt = jnp.concatenate(bts, axis=0)
                        bslot = jnp.concatenate(bss, axis=0)
                    chunks = chunks + jnp.where(jnp.any(hitm), 1,
                                                0).astype(jnp.int32)
                    return (chunks, st[1], bt, bslot)
            else:
                def sub_body(s, st):
                    chunks, best = st[0], st[2:]
                    c = s * 8
                    smn = Vec3(scratch[BRICK_DATA_ROWS, c],
                               scratch[BRICK_DATA_ROWS, c + 1],
                               scratch[BRICK_DATA_ROWS, c + 2])
                    smx = Vec3(scratch[BRICK_DATA_ROWS, c + 3],
                               scratch[BRICK_DATA_ROWS, c + 4],
                               scratch[BRICK_DATA_ROWS, c + 5])
                    valid = scratch[BRICK_DATA_ROWS, c + 6] > 0.0
                    anyhit = _slab_any(smn, smx, best[0]) & valid
                    if _DEBUG_SKIP != "tri":
                        # static 0..SUB_PRIMS bounds (the chunk base rides
                        # in the body) so the loop can be unrolled
                        best = lax.cond(
                            anyhit,
                            lambda b: lax.fori_loop(
                                0, SUB_PRIMS,
                                lambda k, bb: tri_body(s * SUB_PRIMS + k,
                                                       bb),
                                b, unroll=_TRI_UNROLL),
                            lambda b: b, best)
                    chunks = chunks + jnp.where(anyhit, 1,
                                                0).astype(jnp.int32)
                    return (chunks, st[1]) + best

            return lax.fori_loop(0, NUM_SUBS, sub_body, st,
                                 unroll=_SUB_UNROLL)

        # Near-child-first DEPTH-ORDERED walk with a scalar SMEM stack
        # (the reference orders children by hit distance too,
        # scene.h:278-297).  A plain skip-link sweep visits bricks in
        # Morton order, so best-t barely prunes; visiting the packet's
        # near subtree first tightens best-t early and culls far
        # subtrees at their single visit-time box test.  Children are
        # ordered by box-center projection onto the packet's mean
        # direction — scalar reads only, no extra vector tests.
        mdx = jnp.sum(jnp.where(active, dirn.x, 0.0))
        mdy = jnp.sum(jnp.where(active, dirn.y, 0.0))
        mdz = jnp.sum(jnp.where(active, dirn.z, 0.0))

        def _center_key(n):
            br, bc = n // 16, (n % 16) * 8
            cxk = (boxes_ref[br, bc] + boxes_ref[br, bc + 3])
            cyk = (boxes_ref[br, bc + 1] + boxes_ref[br, bc + 4])
            czk = (boxes_ref[br, bc + 2] + boxes_ref[br, bc + 5])
            return cxk * mdx + cyk * mdy + czk * mdz

        stack_ref[0] = jnp.int32(0)

        def cond(st):
            return st[0] > 0

        def body(st):
            sp, nodes, bricks, chunks = st[0] - 1, st[1], st[2], st[3]
            best = st[4:]
            n = stack_ref[sp]
            # 128-wide SMEM packing (models/bricks.py field docs)
            br, bc = n // 16, (n % 16) * 8
            bmin = Vec3(boxes_ref[br, bc], boxes_ref[br, bc + 1],
                        boxes_ref[br, bc + 2])
            bmax = Vec3(boxes_ref[br, bc + 3], boxes_ref[br, bc + 4],
                        boxes_ref[br, bc + 5])
            lr, lc = n // 64, (n % 64) * 2
            brick = links_ref[lr, lc + 1]

            anyhit = _slab_any(bmin, bmax, best[0])
            process = anyhit & (brick >= 0)
            descend = anyhit & (brick < 0)

            @pl.when(process & (_DEBUG_SKIP != "dma"))
            def _():
                dma = pltpu.make_async_copy(bricks_ref.at[brick],
                                            scratch, sem)
                dma.start()
                dma.wait()

            cs = lax.cond(process, process_brick,
                          lambda s: s, (chunks, brick) + best)
            chunks, best = cs[0], cs[2:]

            @pl.when(descend)
            def _():
                left = n + 1
                right = links_ref[left // 64, (left % 64) * 2]  # skip(l)
                lkey = _center_key(left)
                rkey = _center_key(right)
                near = jnp.where(lkey <= rkey, left, right)
                far = jnp.where(lkey <= rkey, right, left)
                stack_ref[sp] = far
                stack_ref[sp + 1] = near   # popped first

            sp = jnp.where(descend, sp + 2, sp)
            nodes = nodes + 1
            bricks = bricks + jnp.where(process, 1, 0).astype(jnp.int32)
            return (sp, nodes, bricks, chunks) + best

        zi = jnp.int32(0)
        st = lax.while_loop(cond, body,
                            (jnp.int32(1), zi, zi, zi) + best)
        if slim:
            t, slot = st[4:]
            if collect_stats:
                return (t, slot, (st[1], st[2], st[3]))
            return (t, slot)
        (t, nx, ny, nz, px, py, pz, mt, ar, ag, ab, mp,
         er, eg, eb, em) = st[4:]
        out = (t, Vec3(nx, ny, nz), Vec3(px, py, pz), mt,
               Vec3(ar, ag, ab), mp, Vec3(er, eg, eb), em)
        if collect_stats:
            return out + ((st[1], st[2], st[3]),)
        return out

    return intersect


def make_brick_intersect_pipelined(boxes_ref, links_ref, bricks_ref,
                                   scratch, stack_ref, sems):
    """Slim packet walk with a two-slot DMA pipeline: when the walk
    reaches leaf N+1 it STARTS that brick's copy and only then drains
    leaf N (tri loops overlap the flight — the r3 attribution measured
    ~11 ms/wave of serialized ``start(); wait()`` in the plain walk).
    Best-t pruning during the walk is one brick stale (leaf N's hits are
    not yet folded when the walk classifies nodes between N and N+1);
    the per-chunk slab gates inside process are exact, so the only cost
    of staleness is admitted-then-culled work, never a wrong image.

    ``scratch`` is [2, BRICK_ROWS, 128] SMEM; ``sems`` a DMA pair.
    Returns ``intersect(org, dirn, tnear, shape, active) -> (t, slot)``
    (the slim contract of make_brick_intersect)."""

    def intersect(org, dirn, tnear, shape, active):
        best = (jnp.full(shape, INF, jnp.float32),
                jnp.full(shape, -1.0, jnp.float32))
        inv = Vec3(1.0 / dirn.x, 1.0 / dirn.y, 1.0 / dirn.z)

        def _slab_any(bmin, bmax, t_best):
            tx0 = (bmin.x - org.x) * inv.x
            tx1 = (bmax.x - org.x) * inv.x
            ty0 = (bmin.y - org.y) * inv.y
            ty1 = (bmax.y - org.y) * inv.y
            tz0 = (bmin.z - org.z) * inv.z
            tz1 = (bmax.z - org.z) * inv.z
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                         jnp.maximum(ty0, ty1)),
                             jnp.maximum(tz0, tz1))
            hitm = ((tf >= jnp.maximum(tn, 0.0)) & (tn <= t_best)
                    & active)
            return jnp.any(hitm)

        def drain(pend, pslot, best):
            """Wait pending brick's DMA and brute-force it (chunk-gated)."""
            def rd(kk, j):
                return scratch[pslot, kk // 4, (kk % 4) * 32 + j]

            def rdv(kk, j):
                return Vec3(rd(kk, j), rd(kk, j + 1), rd(kk, j + 2))

            def tri_body(k, b):
                p0, e1, e2 = rdv(k, 1), rdv(k, 4), rdv(k, 7)
                bt, bs = b
                t, _u, _v, hit = _tri_test(p0, e1, e2, org, dirn, tnear, bt)
                closer = hit & (t < bt)
                sl = (pend * BRICK_PRIMS + k).astype(jnp.float32)
                return (jnp.where(closer, t, bt), jnp.where(closer, sl, bs))

            def sub_body(s, b):
                c = s * 8
                smn = Vec3(scratch[pslot, BRICK_DATA_ROWS, c],
                           scratch[pslot, BRICK_DATA_ROWS, c + 1],
                           scratch[pslot, BRICK_DATA_ROWS, c + 2])
                smx = Vec3(scratch[pslot, BRICK_DATA_ROWS, c + 3],
                           scratch[pslot, BRICK_DATA_ROWS, c + 4],
                           scratch[pslot, BRICK_DATA_ROWS, c + 5])
                valid = scratch[pslot, BRICK_DATA_ROWS, c + 6] > 0.0
                anyhit = _slab_any(smn, smx, b[0]) & valid
                return lax.cond(
                    anyhit,
                    lambda bb: lax.fori_loop(
                        0, SUB_PRIMS,
                        lambda k, b2: tri_body(s * SUB_PRIMS + k, b2),
                        bb, unroll=_TRI_UNROLL),
                    lambda bb: bb, b)

            pltpu.make_async_copy(bricks_ref.at[jnp.maximum(pend, 0)],
                                  scratch.at[pslot],
                                  sems.at[pslot]).wait()
            return lax.fori_loop(0, NUM_SUBS, sub_body, best)

        # near-first ordering key (same as the plain walk)
        mdx = jnp.sum(jnp.where(active, dirn.x, 0.0))
        mdy = jnp.sum(jnp.where(active, dirn.y, 0.0))
        mdz = jnp.sum(jnp.where(active, dirn.z, 0.0))

        def _center_key(n):
            br, bc = n // 16, (n % 16) * 8
            cxk = (boxes_ref[br, bc] + boxes_ref[br, bc + 3])
            cyk = (boxes_ref[br, bc + 1] + boxes_ref[br, bc + 4])
            czk = (boxes_ref[br, bc + 2] + boxes_ref[br, bc + 5])
            return cxk * mdx + cyk * mdy + czk * mdz

        stack_ref[0] = jnp.int32(0)

        def cond(st):
            return (st[0] > 0) | (st[1] >= 0)

        def body(st):
            sp, pend, pslot = st[0], st[1], st[2]
            best = st[3:]
            have = sp > 0
            n = stack_ref[jnp.maximum(sp - 1, 0)]
            br, bc = n // 16, (n % 16) * 8
            bmin = Vec3(boxes_ref[br, bc], boxes_ref[br, bc + 1],
                        boxes_ref[br, bc + 2])
            bmax = Vec3(boxes_ref[br, bc + 3], boxes_ref[br, bc + 4],
                        boxes_ref[br, bc + 5])
            lr, lc = n // 64, (n % 64) * 2
            brick = links_ref[lr, lc + 1]

            anyhit = _slab_any(bmin, bmax, best[0]) & have
            found = anyhit & (brick >= 0)
            descend = anyhit & (brick < 0)
            nslot = 1 - pslot

            # start leaf N+1's copy into the free slot BEFORE draining N
            @pl.when(found)
            def _():
                pltpu.make_async_copy(bricks_ref.at[brick],
                                      scratch.at[nslot],
                                      sems.at[nslot]).start()

            do_drain = (pend >= 0) & (found | (sp <= 1))
            best = lax.cond(do_drain,
                            lambda b: drain(pend, pslot, b),
                            lambda b: b, best)

            @pl.when(descend)
            def _():
                left = n + 1
                right = links_ref[left // 64, (left % 64) * 2]
                lkey = _center_key(left)
                rkey = _center_key(right)
                near = jnp.where(lkey <= rkey, left, right)
                far = jnp.where(lkey <= rkey, right, left)
                stack_ref[sp - 1] = far
                stack_ref[sp] = near   # popped first

            sp = jnp.where(have,
                           jnp.where(descend, sp + 1, sp - 1), sp)
            pend = jnp.where(found, brick,
                             jnp.where(do_drain, jnp.int32(-1), pend))
            pslot = jnp.where(found, nslot, pslot)
            return (sp, pend, pslot) + best

        st = lax.while_loop(cond, body,
                            (jnp.int32(1), jnp.int32(-1), jnp.int32(0))
                            + best)
        return st[3], st[4]

    return intersect


def _make_brick_kernel(width: int, height: int, S: int, Ntop: int,
                       num_samples: int, seed: int, max_depth: int,
                       block_rows: int, rr_start_depth: int):
    def kernel(cam_ref, bg_ref, meta_ref, sph_ref, boxes_ref, links_ref,
               bricks_ref, outr_ref, outg_ref, outb_ref, scratch, stack_ref,
               sem):
        intersect = make_brick_intersect(sph_ref, boxes_ref, links_ref,
                                         bricks_ref, scratch, stack_ref,
                                         sem, S)
        body = make_persistent_kernel(width, height, num_samples, seed,
                                      max_depth, block_rows, intersect,
                                      tile=TILE, rr_start_depth=rr_start_depth)
        body(cam_ref, bg_ref, meta_ref, outr_ref, outg_ref, outb_ref)

    return kernel


def render_blocks_bricks(sph_rows, top_boxes, top_links, brick_data,
                         cam_data, bg, sample_start, blk0, num_real,
                         width: int, height: int, n_blocks: int,
                         num_samples: int, seed: int, max_depth: int,
                         S: int, Ntop: int, interpret: bool = False,
                         rr_start_depth: int = 5):
    """Render tile-blocks [blk0, blk0 + n_blocks) of the TILE grid — the
    unit multi-chip sharding partitions (parallel/sharding.py).  Returns
    (r, g, b) each [n_blocks * BLOCK_ROWS, LANES] in tile-swizzled order
    (un-permute with tile_permutation)."""
    # f32 pixel-index reconstruction in the kernel is exact only below 2^24
    assert width * height < 2 ** 24, (
        "brick tracer pixel indices ride f32; use the XLA path above 16.7M px")
    from .megakernel import pack_meta
    rows_pad = n_blocks * BLOCK_ROWS
    cam = jnp.zeros((1, 12), jnp.float32).at[0].set(
        cam_data.reshape(12).astype(jnp.float32))
    bg_arr = jnp.zeros((1, 4), jnp.float32).at[0, :3].set(bg)
    meta = pack_meta(sample_start, blk0, num_real)

    kernel = _make_brick_kernel(width, height, S, Ntop, num_samples, seed,
                                max_depth, BLOCK_ROWS, rr_start_depth)
    out_shape = jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32)
    smem = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.SMEM)
    outspec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[smem((1, 12)), smem((1, 4)), smem((1, 4)),
                  smem(sph_rows.shape), smem(top_boxes.shape),
                  smem(top_links.shape),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(outspec, outspec, outspec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[pltpu.SMEM((BRICK_ROWS, 128), jnp.float32),
                        pltpu.SMEM((STACK_DEPTH,), jnp.int32),  # trav. stack
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(cam, bg_arr, meta, sph_rows, top_boxes, top_links, brick_data)


@partial(jax.jit, static_argnames=("width", "height", "num_samples", "seed",
                                   "max_depth", "S", "Ntop", "interpret",
                                   "rr_start_depth"))
def _render_bricks(sph_rows, top_boxes, top_links, brick_data, cam_data, bg,
                   sample_start, width: int, height: int, num_samples: int,
                   seed: int, max_depth: int, S: int, Ntop: int,
                   interpret: bool = False,
                   rr_start_depth: int = 5):
    n_blocks = tile_grid(width, height, TILE)
    perm = jnp.asarray(tile_permutation(width, height, BLOCK_ROWS, TILE))
    r, g, b = render_blocks_bricks(sph_rows, top_boxes, top_links,
                                   brick_data, cam_data, bg, sample_start,
                                   0, -1, width, height, n_blocks,
                                   num_samples, seed, max_depth, S, Ntop,
                                   interpret, rr_start_depth)
    img = jnp.stack([r.reshape(-1)[perm], g.reshape(-1)[perm],
                     b.reshape(-1)[perm]], axis=-1)
    return img.reshape(height, width, 3)


def render_samples_bricks(brickset: BrickSet, cam_data, width: int,
                          height: int, sample_start, num_samples: int = 1,
                          seed: int = 1984, max_depth: int = MAX_DEPTH,
                          interpret: bool = False,
                          rr_start_depth: int = 5):
    """Large-scene drop-in for ops.integrator.render_samples: the radiance
    SUM of ``num_samples`` passes, [H,W,3]."""
    bg = jnp.stack([jnp.asarray(brickset.bg_r), jnp.asarray(brickset.bg_g),
                    jnp.asarray(brickset.bg_b)])
    return _render_bricks(brickset.sph_rows, brickset.top_boxes,
                          brickset.top_links, brickset.brick_data,
                          cam_data, bg, sample_start, width, height,
                          num_samples, seed, max_depth,
                          brickset.num_spheres, brickset.num_top,
                          interpret=interpret,
                          rr_start_depth=rr_start_depth)
