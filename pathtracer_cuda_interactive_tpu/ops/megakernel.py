"""Pallas TPU megakernel: the whole progressive sample pass in one kernel.

This is the speed-of-light path for small scenes (the reference's
interactive corpus: sphere scenes and the Cornell box).  The XLA-lowered
wavefront integrator (ops/integrator.py) round-trips the full SoA ray state
through HBM on every bounce and pays gather costs for material lookups;
here the entire camera->bounce-loop->accumulate pipeline runs inside a
single ``pallas_call`` so per-ray state lives in VMEM/registers for the
whole sample, and materials are FOLDED into per-primitive records
(models/device_scene.py::_build_prim_rows) so shading does zero gathers:
the whole prim table lives in SMEM and the per-primitive fori_loop reads
each record as scalars (sregs broadcast into vector ops for free) and
selects the winner's attributes with masks.

Semantics are bit-compatible with the XLA path: same RNG streams (int32
PCG twins, ops/rng.py), same draw order (2 camera jitter + 3 BSDF + 1 RR
per bounce), same radiance.cuh:21-79 bounce logic.  tests/test_megakernel.py
asserts image agreement.

Blocks of ``BLOCK_ROWS`` x 128 rays per grid step; each block's bounce
``while_loop`` exits as soon as *its* lanes are all dead, so coherent tiles
finish early (the lockstep-divergence mitigation of SURVEY.md §7 hard
part 1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import brdf, rng
from .integrator import LANES, MAX_DEPTH, RR_START_DEPTH, SECONDARY_TNEAR
from .vec import Vec3, cross, dot, max_elem, normalize, where

BLOCK_ROWS = 64
INF = float("inf")

# Scenes up to this many primitives render through the megakernel (the
# per-prim loop is O(P); beyond this the BVH wavefront path wins).
MEGAKERNEL_MAX_PRIMS = 512


def _scalar(rows_ref, k, j):
    """Scalar read from the SMEM prim table.  Mosaic cannot broadcast a
    [1,1] VMEM slice into both sublanes and lanes, but an SMEM scalar rides
    a sreg and broadcasts into vector ops for free."""
    return rows_ref[k, j]


def _svec(rows_ref, k, j) -> Vec3:
    return Vec3(rows_ref[k, j], rows_ref[k, j + 1], rows_ref[k, j + 2])


def _intersect_all(rows_ref, S: int, F: int, org: Vec3, dirn: Vec3, tnear):
    """Closest hit over all prims with attribute selection-in-loop.
    Returns (t [inf=miss], shading-normal (unnormalized), mtype, albedo,
    mparam, emission, is_emitter)."""
    shape = org.x.shape
    zero = jnp.zeros(shape, jnp.float32)
    best = (jnp.full(shape, INF, jnp.float32),            # t
            zero, zero, zero,                             # ns (raw)
            zero, zero, zero,                             # hit position
            zero,                                         # mtype
            zero, zero, zero,                             # albedo
            zero,                                         # mparam
            zero, zero, zero,                             # emission
            zero)                                         # is_emitter

    def select(best, closer, t, ns: Vec3, pos: Vec3, k):
        (bt, bnx, bny, bnz, bpx, bpy, bpz, bmt, bar, bag, bab, bmp,
         ber, beg, beb, bem) = best
        s = lambda j: _scalar(rows_ref, k, j)
        sel = lambda a, b: jnp.where(closer, a, b)
        return (sel(t, bt),
                sel(ns.x, bnx), sel(ns.y, bny), sel(ns.z, bnz),
                sel(pos.x, bpx), sel(pos.y, bpy), sel(pos.z, bpz),
                sel(s(19), bmt),
                sel(s(20), bar), sel(s(21), bag),
                sel(s(22), bab), sel(s(23), bmp),
                sel(s(24), ber), sel(s(25), beg),
                sel(s(26), beb), sel(s(27), bem))

    def sphere_body(k, best):
        c = _svec(rows_ref, k, 1)
        r = _scalar(rows_ref, k, 4)
        bt = best[0]
        t, hit = _sphere_test(c, r, org, dirn, tnear, bt)
        closer = hit & (t < bt)
        # position + normal exactly as shade_setup/sphere_shading
        pos = Vec3(org.x + dirn.x * t, org.y + dirn.y * t,
                   org.z + dirn.z * t)
        ns = Vec3(pos.x - c.x, pos.y - c.y, pos.z - c.z)
        return select(best, closer, t, ns, pos, k)

    def tri_body(k, best):
        p0 = _svec(rows_ref, k, 1)
        e1 = _svec(rows_ref, k, 4)
        e2 = _svec(rows_ref, k, 7)
        bt = best[0]
        t, u, v, hit = _tri_test(p0, e1, e2, org, dirn, tnear, bt)
        closer = hit & (t < bt)
        w = 1.0 - u - v
        # barycentric position, matching shade_setup (org + t*dir drifts
        # ~|org|*eps below big surfaces and self-shadows systematically)
        pos = Vec3(p0.x + e1.x * u + e2.x * v,
                   p0.y + e1.y * u + e2.y * v,
                   p0.z + e1.z * u + e2.z * v)
        n0 = _svec(rows_ref, k, 10)
        n1 = _svec(rows_ref, k, 13)
        n2 = _svec(rows_ref, k, 16)
        ni = Vec3(n0.x * w + n1.x * u + n2.x * v,
                  n0.y * w + n1.y * u + n2.y * v,
                  n0.z * w + n1.z * u + n2.z * v)
        # flat triangles: geometric normal from the same f32 cross as
        # shade_setup (row-28 flag; corner rows are zero for flat prims)
        ng = cross(e1, e2)
        smooth = _scalar(rows_ref, k, 28) > 0.5
        ns = Vec3(jnp.where(smooth, ni.x, ng.x),
                  jnp.where(smooth, ni.y, ng.y),
                  jnp.where(smooth, ni.z, ng.z))
        return select(best, closer, t, ns, pos, k)

    if S > 0:
        best = lax.fori_loop(0, S, sphere_body, best)
    if F > 0:
        best = lax.fori_loop(S, S + F, tri_body, best)

    (t, nx, ny, nz, px, py, pz, mt, ar, ag, ab, mp, er, eg, eb, em) = best
    return (t, Vec3(nx, ny, nz), Vec3(px, py, pz), mt, Vec3(ar, ag, ab),
            mp, Vec3(er, eg, eb), em)


def _occluded_all(rows_ref, S: int, F: int, org: Vec3, dirn: Vec3,
                  tnear, tfar):
    """Any-hit over the resident SMEM prim table: 1.0 where the segment
    (tnear, tfar) is blocked.  Brute force like _intersect_all but without
    attribute selection — the shadow-ray half of NEE (the reference's dead
    occlusion helpers scene.h:306-330, revived the TPU way).  Returns f32
    (Mosaic: no bool vectors across regions)."""
    shape = org.x.shape
    occ = jnp.zeros(shape, jnp.float32)

    def sphere_body(k, occ):
        c = _svec(rows_ref, k, 1)
        r = _scalar(rows_ref, k, 4)
        _, hit = _sphere_test(c, r, org, dirn, tnear, tfar)
        return jnp.where(hit, 1.0, occ)

    def tri_body(k, occ):
        p0 = _svec(rows_ref, k, 1)
        e1 = _svec(rows_ref, k, 4)
        e2 = _svec(rows_ref, k, 7)
        _, _, _, hit = _tri_test(p0, e1, e2, org, dirn, tnear, tfar)
        return jnp.where(hit, 1.0, occ)

    if S > 0:
        occ = lax.fori_loop(0, S, sphere_body, occ)
    if F > 0:
        occ = lax.fori_loop(S, S + F, tri_body, occ)
    return occ


def _sphere_test(center, radius, org, dirn, tnear, tfar):
    """Same math as geometry.intersect_sphere with unit |dirn| assumed
    NOT (keeps full quadratic for parity)."""
    from . import geometry as g
    return g.intersect_sphere(center, radius, org, dirn, tnear, tfar)


def _tri_test(p0, e1, e2, org, dirn, tnear, tfar):
    from . import geometry as g
    return g.intersect_triangle(p0, e1, e2, org, dirn, tnear, tfar)


def make_persistent_kernel(width: int, height: int, num_samples: int,
                           seed: int, max_depth: int, block_rows: int,
                           intersect_fn, tile=None,
                           rr_start_depth: int = RR_START_DEPTH,
                           nee_fn=None):
    """Build the persistent-lane render kernel body around a scene-specific
    closest-hit closure.

    ``intersect_fn(org, dirn, tnear, shape, active) -> (t, ns_raw, pos,
    mtype, albedo, mparam, emission, is_emitter)`` — t == inf on miss.
    ``active`` is the live-lane i1 mask: adaptive intersectors (the brick
    tracer) use it to skip work for dead/exhausted lanes whose stale rays
    would otherwise drag the packet through the scene.  The shell provides
    everything else: pixel/camera setup, path regeneration, the
    radiance.cuh:21-79 bounce state machine, RNG streams, and sample
    banking.  Shared by the small-scene SMEM megakernel below and the
    brick tracer (ops/brickkernel.py).

    ``nee_fn(pos, n, wi, mat, T, active) -> Vec3`` (optional) returns the
    next-event-estimation direct-lighting term to add to L at each hit —
    already masked by the caller (deterministic: draws no RNG, so enabling
    it leaves every sample stream bit-identical, same contract as
    ops/integrator.py::_direct_point_lights).

    ``tile=(TW, TH)`` swizzles the block's lanes onto a compact TW x TH
    pixel tile (TW*TH == block_rows*128) instead of a row-major band —
    a 640-wide band 3 pixels tall sweeps a frustum across the whole scene,
    while a 64x32 tile keeps the packet's traversal union tight.  The
    caller must un-permute the output (tile_permutation below)."""
    R = width * height

    def kernel_body(cam_ref, bg_ref, meta_ref, outr_ref, outg_ref,
                    outb_ref):
        # meta: [0,0] sample_start, [0,1] block offset (multi-chip sharding
        # renders a RANGE of grid blocks per chip — parallel/sharding.py),
        # [0,2] real pass count (sample-sharded chips run the same static
        # num_samples but only bank the first num_real; -1 means "all").
        blk = pl.program_id(0) + meta_ref[0, 1]
        rowid = lax.broadcasted_iota(jnp.int32, (block_rows, LANES), 0)
        laneid = lax.broadcasted_iota(jnp.int32, (block_rows, LANES), 1)
        shape = rowid.shape
        if tile is None:
            pix = (blk * block_rows + rowid) * LANES + laneid
            valid = pix < R
            # pixel coords via float math (pix < 2^24 so f32 holds it
            # exactly; Mosaic has no vector integer division).  The
            # reciprocal multiply can be off by one ulp when width isn't a
            # power of two, so correct the quotient until 0 <= i < width.
            pixf = pix.astype(jnp.float32)
            j = jnp.floor(pixf * (1.0 / width))
            i = pixf - j * width
            j = jnp.where(i >= width, j + 1.0,
                          jnp.where(i < 0.0, j - 1.0, j))
            i = jnp.where(i >= width, i - width,
                          jnp.where(i < 0.0, i + width, i))
        else:
            tw, th = tile
            assert tw * th == block_rows * LANES
            assert tw <= LANES and LANES % tw == 0
            lanes_per_row = tw
            rows_per_tile_row = LANES // tw
            tiles_x = -(-width // tw)
            tile_x = blk % tiles_x
            tile_y = blk // tiles_x
            ii = tile_x * tw + laneid % lanes_per_row
            jj = (tile_y * th + rowid * rows_per_tile_row
                  + laneid // lanes_per_row)
            valid = (ii < width) & (jj < height)
            pix = jj * width + ii
            i = ii.astype(jnp.float32)
            j = jj.astype(jnp.float32)

        cam_o = Vec3(cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2])
        cam_tl = Vec3(cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5])
        cam_h = Vec3(cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8])
        cam_v = Vec3(cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11])
        bg = Vec3(bg_ref[0, 0], bg_ref[0, 1], bg_ref[0, 2])
        sample_start = meta_ref[0, 0]

        ones = jnp.ones(shape, jnp.float32)
        zeros = jnp.zeros(shape, jnp.float32)

        # --- persistent-lane loop with PATH REGENERATION ----------------
        # One while_loop for the whole pixel tile: the moment a lane's path
        # terminates (miss / absorbed / RR), its radiance is banked into acc
        # and the lane immediately starts its NEXT sample — dead lanes never
        # idle while siblings finish (the classic persistent-threads /
        # regeneration answer to SURVEY.md §7 hard part 1).  Per (pixel,
        # sample) RNG streams and draw order are identical to the XLA path.
        #
        # Carried masks/counters ride as f32 (bool vectors crossing the
        # while-region boundary hit Mosaic's unsupported i8->i1 trunc; the
        # counters stay < 2^24 so f32 is exact).
        num_real = meta_ref[0, 2]
        nsf = jnp.where(num_real >= 0, num_real,
                        jnp.int32(num_samples)).astype(jnp.float32)

        def cond(st):
            active_f, s = st[0], st[1]
            return jnp.any((active_f > 0.0) | (s < nsf))

        def body(st):
            (active_f, s, depth, ox, oy, oz, dx, dy, dz, Tx, Ty, Tz,
             Lx, Ly, Lz, ar, ag, ab, state) = st
            active = active_f > 0.0

            # -- regeneration: dead lanes with samples left start sample s
            regen = (active_f <= 0.0) & (s < nsf) & valid
            rstate = rng.seed_rays_i32(
                pix, sample_start + s.astype(jnp.int32), seed)
            rstate, u1 = rng.next_uniform_i32(rstate)
            rstate, u2 = rng.next_uniform_i32(rstate)
            u = (i + u1) / width
            v = (j + u2) / height
            rdir = normalize(Vec3(
                cam_tl.x + u * cam_h.x - v * cam_v.x - cam_o.x,
                cam_tl.y + u * cam_h.y - v * cam_v.y - cam_o.y,
                cam_tl.z + u * cam_h.z - v * cam_v.z - cam_o.z))
            org = Vec3(jnp.where(regen, cam_o.x, ox),
                       jnp.where(regen, cam_o.y, oy),
                       jnp.where(regen, cam_o.z, oz))
            dirn = Vec3(jnp.where(regen, rdir.x, dx),
                        jnp.where(regen, rdir.y, dy),
                        jnp.where(regen, rdir.z, dz))
            T = Vec3(jnp.where(regen, 1.0, Tx), jnp.where(regen, 1.0, Ty),
                     jnp.where(regen, 1.0, Tz))
            L = Vec3(jnp.where(regen, 0.0, Lx), jnp.where(regen, 0.0, Ly),
                     jnp.where(regen, 0.0, Lz))
            state = jnp.where(regen, rstate, state)
            depth = jnp.where(regen, 0.0, depth)
            s = jnp.where(regen, s + 1.0, s)
            active = active | regen
            tnear = jnp.where(depth > 0.0, SECONDARY_TNEAR, 0.0)

            # -- one bounce for every live lane
            (t, ns_raw, pos, mt, alb, mp, em, emit) = intersect_fn(
                org, dirn, tnear, shape, active)

            # complements are spelled as direct comparisons: vector
            # logical_not lowers to xori with a dense<true> i1 constant,
            # which Mosaic legalizes through an unsupported i8->i1 trunc
            miss = t == INF
            hit = t < INF
            take_bg = active & miss
            L = Vec3(jnp.where(take_bg, L.x + T.x * bg.x, L.x),
                     jnp.where(take_bg, L.y + T.y * bg.y, L.y),
                     jnp.where(take_bg, L.z + T.z * bg.z, L.z))
            active = active & hit

            ns = normalize(ns_raw)
            wi = -dirn
            cos_view = dot(wi, ns)

            front_emit = active & (emit > 0.0) & (cos_view > 0.0)
            L = Vec3(jnp.where(front_emit, L.x + T.x * em.x, L.x),
                     jnp.where(front_emit, L.y + T.y * em.y, L.y),
                     jnp.where(front_emit, L.z + T.z * em.z, L.z))

            n = where(cos_view < 0.0, -ns, ns)

            mat = brdf.MatLookup(mtype=mt, color=alb, param=mp)
            if nee_fn is not None:
                extra = nee_fn(pos, n, wi, mat, T, active)
                L = Vec3(L.x + extra.x, L.y + extra.y, L.z + extra.z)

            state, su1 = rng.next_uniform_i32(state)
            state, su2 = rng.next_uniform_i32(state)
            state, su3 = rng.next_uniform_i32(state)
            wo, is_spec, weight = brdf.sample_brdf_from_uniforms(
                mat, n, wi, su1, su2, su3)
            ev_value, ev_pdf = brdf.eval_brdf(mat, n, wi, wo)

            ok_spec = max_elem(weight) > 0.0
            ok_scatter = (max_elem(ev_value) > 0.0) & (ev_pdf > 0.0)
            pdf_safe = jnp.where(ev_pdf > 0.0, ev_pdf, 1.0)
            contrib = where(is_spec, weight, ev_value * (1.0 / pdf_safe))
            # select with an i1-vector RESULT is another op Mosaic
            # legalizes through the unsupported i8->i1 trunc; route the
            # bool select through f32 instead
            ok = jnp.where(is_spec,
                           jnp.where(ok_spec, 1.0, 0.0),
                           jnp.where(ok_scatter, 1.0, 0.0)) > 0.5

            upd = active & ok
            T = where(upd, T * contrib, T)
            active = active & ok

            org = where(active, pos, org)
            dirn = where(active, wo, dirn)

            state, ru = rng.next_uniform_i32(state)
            rr_on = depth > float(rr_start_depth)
            not_rr = depth <= float(rr_start_depth)
            p = jnp.maximum(0.5, 1.0 - max_elem(T))
            keep = ru >= p          # == ~kill within rr_on lanes
            scale = 1.0 / jnp.where(rr_on & keep & (p < 1.0), 1.0 - p, 1.0)
            T = where(active & rr_on & keep, T * scale, T)
            active = active & (keep | not_rr)

            # per-lane depth cap (radiance.cuh:24 loop bound)
            depth = depth + 1.0
            active = active & (depth < float(max_depth))

            # -- bank finished samples; L resets at the lane's next regen
            # (no vector logical_not: complement via the f32 mask compare)
            active_new_f = jnp.where(active, 1.0, 0.0)
            done = (active_new_f <= 0.0) & ((active_f > 0.0) | regen)
            ar = jnp.where(done, ar + L.x, ar)
            ag = jnp.where(done, ag + L.y, ag)
            ab = jnp.where(done, ab + L.z, ab)

            active_f = active_new_f
            return (active_f, s, depth, org.x, org.y, org.z,
                    dirn.x, dirn.y, dirn.z, T.x, T.y, T.z, L.x, L.y, L.z,
                    ar, ag, ab, state)

        # padding lanes (pix >= R) never regenerate, so they start with all
        # samples "already taken" or the loop condition would never clear
        s0 = jnp.where(valid, 0.0, nsf)
        st = (zeros, s0, zeros,                          # active, s, depth
              zeros, zeros, zeros, zeros, zeros, ones,   # org, dirn
              ones, ones, ones, zeros, zeros, zeros,     # T, L
              zeros, zeros, zeros,                       # acc
              jnp.zeros(shape, jnp.int32))               # rng
        st = lax.while_loop(cond, body, st)
        outr_ref[:] = st[15]
        outg_ref[:] = st[16]
        outb_ref[:] = st[17]

    return kernel_body


def tile_grid(width: int, height: int, tile) -> int:
    """Number of grid blocks for a tile-swizzled kernel."""
    tw, th = tile
    return (-(-width // tw)) * (-(-height // th))


def tile_permutation(width: int, height: int, block_rows: int,
                     tile) -> np.ndarray:
    """perm[p] = index into the flattened [n_blocks*block_rows, 128] kernel
    output holding pixel p — the host-side inverse of the in-kernel tile
    swizzle above."""
    tw, th = tile
    tiles_x = -(-width // tw)
    n_blocks = tile_grid(width, height, tile)
    blk = np.arange(n_blocks)[:, None, None]
    rowid = np.arange(block_rows)[None, :, None]
    laneid = np.arange(LANES)[None, None, :]
    ii = (blk % tiles_x) * tw + laneid % tw
    jj = (blk // tiles_x) * th + rowid * (LANES // tw) + laneid // tw
    flat = ((blk * block_rows + rowid) * LANES + laneid)
    valid = (ii < width) & (jj < height)
    pix = (jj * width + ii)[valid]
    perm = np.empty(width * height, np.int64)
    perm[pix] = flat[np.broadcast_to(valid, flat.shape)]
    return perm


def _make_kernel(width: int, height: int, S: int, F: int, num_samples: int,
                 seed: int, max_depth: int, block_rows: int,
                 rr_start_depth: int, num_lights: int = 0):
    """Small-scene kernel: the persistent shell around the resident-SMEM
    brute-force intersector.  With ``num_lights`` > 0 the kernel takes an
    extra [NL, 8] SMEM table (pos xyz, intensity rgb) and adds point-light
    NEE with brute-force shadow rays over the same prim table."""

    def kernel(cam_ref, bg_ref, meta_ref, rows_ref, *rest):
        if num_lights > 0:
            lights_ref = rest[0]
            outr_ref, outg_ref, outb_ref = rest[1:]
        else:
            outr_ref, outg_ref, outb_ref = rest

        def intersect(org, dirn, tnear, shape, active):
            return _intersect_all(rows_ref, S, F, org, dirn, tnear)

        nee_fn = None
        if num_lights > 0:
            def nee_fn(pos, n, wi, mat, T, active):
                # _direct_point_lights (ops/integrator.py:54-80) semantics
                out = Vec3.zeros(pos.x.shape)
                for l in range(num_lights):
                    lp = _svec(lights_ref, l, 0)
                    inten = _svec(lights_ref, l, 3)
                    d = lp - pos
                    dist2 = dot(d, d)
                    dist = jnp.sqrt(dist2)
                    wo = d * (1.0 / jnp.maximum(dist, 1e-20))
                    ev_value, _ = brdf.eval_brdf(mat, n, wi, wo)
                    occf = _occluded_all(rows_ref, S, F, pos, wo,
                                         SECONDARY_TNEAR,
                                         dist * (1.0 - 1e-3))
                    contrib = T * ev_value * inten * \
                        (1.0 / jnp.maximum(dist2, 1e-20))
                    take = active & (occf <= 0.5)
                    out = Vec3(jnp.where(take, out.x + contrib.x, out.x),
                               jnp.where(take, out.y + contrib.y, out.y),
                               jnp.where(take, out.z + contrib.z, out.z))
                return out

        body = make_persistent_kernel(width, height, num_samples, seed,
                                      max_depth, block_rows, intersect,
                                      rr_start_depth=rr_start_depth,
                                      nee_fn=nee_fn)
        body(cam_ref, bg_ref, meta_ref, outr_ref, outg_ref, outb_ref)

    return kernel


def pack_meta(sample_start, blk0=0, num_real=-1):
    """[1,4] i32 SMEM meta row shared by the Pallas render kernels:
    sample_start, block offset, real-pass count (-1 = all)."""
    return (jnp.zeros((1, 4), jnp.int32)
            .at[0, 0].set(jnp.asarray(sample_start, jnp.int32))
            .at[0, 1].set(jnp.asarray(blk0, jnp.int32))
            .at[0, 2].set(jnp.asarray(num_real, jnp.int32)))


def megakernel_total_blocks(width: int, height: int) -> int:
    return -(-(-(-(width * height) // LANES)) // BLOCK_ROWS)


def render_blocks_pallas(prim_rows, cam_data, bg, sample_start, blk0,
                         num_real, width: int, height: int,
                         n_blocks: int, num_samples: int, seed: int,
                         max_depth: int, S: int, F: int,
                         interpret: bool = False,
                         rr_start_depth: int = RR_START_DEPTH,
                         light_rows=None):
    """Render grid blocks [blk0, blk0 + n_blocks) of the flat pixel space —
    the unit multi-chip sharding partitions (each chip renders its own
    block range; parallel/sharding.py).  Returns (r, g, b) each
    [n_blocks * BLOCK_ROWS, LANES]: the radiance sums of the first
    ``num_real`` (0 = num_samples) of ``num_samples`` passes."""
    # f32 pixel-index reconstruction in the kernel is exact only below 2^24
    assert width * height < 2 ** 24, (
        "megakernel pixel indices ride f32; use the XLA path above 16.7M px")
    rows_pad = n_blocks * BLOCK_ROWS
    cam = jnp.zeros((1, 12), jnp.float32).at[0].set(
        cam_data.reshape(12).astype(jnp.float32))
    bg_arr = jnp.zeros((1, 4), jnp.float32).at[0, :3].set(bg)
    meta = pack_meta(sample_start, blk0, num_real)

    NL = 0 if light_rows is None else int(light_rows.shape[0])
    kernel = _make_kernel(width, height, S, F, num_samples, seed, max_depth,
                          BLOCK_ROWS, rr_start_depth, NL)
    out_shape = jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32)
    smem = lambda shp: pl.BlockSpec(shp, lambda i: (0, 0),
                                    memory_space=pltpu.SMEM)
    outspec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [smem((1, 12)), smem((1, 4)), smem((1, 4)),
                smem(prim_rows.shape)]
    args = [cam, bg_arr, meta, prim_rows]
    if NL > 0:
        in_specs.append(smem(light_rows.shape))
        args.append(light_rows)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=(outspec, outspec, outspec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(*args)


@partial(jax.jit, static_argnames=("width", "height", "num_samples", "seed",
                                   "max_depth", "S", "F", "interpret",
                                   "rr_start_depth"))
def _render_pallas(prim_rows, cam_data, bg, sample_start, width: int,
                   height: int, num_samples: int, seed: int, max_depth: int,
                   S: int, F: int, interpret: bool = False,
                   rr_start_depth: int = RR_START_DEPTH, light_rows=None):
    R = width * height
    n_blocks = megakernel_total_blocks(width, height)
    r, g, b = render_blocks_pallas(prim_rows, cam_data, bg, sample_start,
                                   0, -1, width, height, n_blocks,
                                   num_samples, seed, max_depth, S, F,
                                   interpret, rr_start_depth, light_rows)
    img = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)],
                    axis=-1)[:R]
    return img.reshape(height, width, 3)


def pack_light_rows(scene):
    """[NL, 8] f32 SMEM point-light table (pos xyz, intensity rgb, pad),
    or None when the scene has no point lights."""
    NL = int(scene.light_pos.shape[0])
    if NL == 0:
        return None
    rows = jnp.zeros((NL, 8), jnp.float32)
    rows = rows.at[:, 0:3].set(jnp.asarray(scene.light_pos, jnp.float32))
    rows = rows.at[:, 3:6].set(
        jnp.asarray(scene.light_intensity, jnp.float32))
    return rows


def render_samples_pallas(scene, cam_data, width: int, height: int,
                          sample_start, num_samples: int = 1,
                          seed: int = 1984, max_depth: int = MAX_DEPTH,
                          interpret: bool = False,
                          rr_start_depth: int = RR_START_DEPTH,
                          nee: bool = False):
    """Drop-in replacement for ops.integrator.render_samples on scenes with
    <= MEGAKERNEL_MAX_PRIMS primitives.  Returns the [H,W,3] radiance sum
    of ``num_samples`` passes.  ``nee=True`` adds point-light next-event
    estimation (matches the XLA path's _direct_point_lights)."""
    bg = jnp.stack([jnp.asarray(scene.bg_r), jnp.asarray(scene.bg_g),
                    jnp.asarray(scene.bg_b)])
    light_rows = pack_light_rows(scene) if nee else None
    return _render_pallas(scene.prim_rows, cam_data, bg, sample_start,
                          width, height, num_samples, seed, max_depth,
                          scene.num_spheres, scene.num_triangles,
                          interpret=interpret,
                          rr_start_depth=rr_start_depth,
                          light_rows=light_rows)
