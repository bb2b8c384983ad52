"""Superbrick decomposition for the Pallas MXU tracer (ops/mx2.py).

Second-generation MX scene layout.  Round 2's MX tracer (models/mxset.py +
ops/mxtrace.py) proved the Plucker-matmul formulation but ran it as global
XLA "rounds" with [packets, 128, 4T] HBM intermediates — gigabytes per
round at frame sizes (ADVICE r2).  This layout feeds a Pallas kernel that
keeps everything in VMEM/SMEM:

  * **superbrick** — a binned-SAH treelet leaf (models/sah.py) of up to
    ``SB_PRIMS`` (512) triangles, stored as ONE dense coefficient slab
    [256, 128] f32 that a single DMA brings HBM -> VMEM;
  * **sub-brick** — 32 consecutive (Morton-ordered) triangles inside the
    superbrick with their own AABB; the kernel culls at sub granularity
    and intersects one sub with ONE MXU pass:
    dot(C [16,128], F [16,128], contract sublanes) = [128, 128] where the
    output rows are [det(32) | u*det(32) | v*det(32) | t*det(32)] and the
    columns are the packet's 128 rays.

Slab layout: ``coeff[b, s*16 + k, q*32 + j]`` = Plucker coefficient of
feature k (0..9; rows 10..15 zero padding) for quantity q (det,u,v,t) of
triangle j of sub-brick s — i.e. C is stored TRANSPOSED (features on
sublanes) so the kernel needs no transposes anywhere: ray features are
built [16, 128] directly from the ray SoA and the MXU contracts sublanes.

Translation invariance (ADVICE r2): coefficients are built from
``p0 - shift`` with shift = the scene-box center, and the kernel subtracts
the same shift from ray origins before building features — the o x d
feature's magnitude then scales with the scene, not its world position.

Reference semantics being re-housed: triangle intersection
shape.cuh:188-215, BVH-leaf granularity scene.h:246-301 (theirs is
1 prim/leaf per-thread; ours is 32-prim subs per 128-ray packet).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np

from ..models.bvh import morton_codes
from ..models.device_scene import _build_prim_rows
from .mxset import _tri_coeff
from ..models.sah import build_sah_treelets
from ..models.scenepack import ScenePack

SB_PRIMS = 512           # triangles per superbrick (one [256,128] slab)
SUB_PRIMS = 32           # triangles per sub-brick (one MXU pass)
NUM_SUBS = SB_PRIMS // SUB_PRIMS     # 16
SLAB_ROWS = NUM_SUBS * 16            # 16 feature rows (10 + 6 pad) per sub


@dataclass
class MX2Set:
    """Device-ready superbrick scene (host numpy; registered as a pytree)."""
    coeff: np.ndarray        # [B, 256, 128] f32 transposed Plucker slabs
    subbox: np.ndarray       # [B, 128] f32: sub s field f at [b, s*8+f],
    #                          f = 0..5 min/max xyz, 6 = valid flag
    brick_lo: np.ndarray     # [B, 3] f32 superbrick AABB min (world)
    brick_hi: np.ndarray     # [B, 3] f32
    tri_rows: np.ndarray     # [B*512, 32] f32 megakernel-layout attr rows
    sph_rows: np.ndarray     # [S_pad, 32] f32 resident sphere table
    shift: np.ndarray        # [3] f32 origin shift baked into coeff
    bg_r: np.ndarray
    bg_g: np.ndarray
    bg_b: np.ndarray
    light_pos: np.ndarray        # [L,3] point lights (NEE)
    light_intensity: np.ndarray  # [L,3]
    scene_lo: np.ndarray     # [3] f32 scene AABB (sort-key normalization)
    scene_hi: np.ndarray
    num_spheres: int
    num_bricks: int

    @staticmethod
    def from_pack(pack: ScenePack) -> "MX2Set":
        return build_mx2set(pack)


def build_mx2set(pack: ScenePack) -> MX2Set:
    S, F = pack.num_spheres, pack.num_triangles
    if F == 0:
        raise ValueError("MX2 set needs triangles; sphere-only scenes take "
                         "the megakernel path")
    rows = _build_prim_rows(pack)            # [P_pad, 32], spheres first
    sph_pad = max(8, -(-max(S, 1) // 8) * 8)
    sph_rows = np.zeros((sph_pad, 32), np.float32)
    sph_rows[:S] = rows[:S]
    tri_rows_src = rows[S:S + F]

    p0 = pack.tri_p0.astype(np.float64)
    e1 = pack.tri_e1.astype(np.float64)
    e2 = pack.tri_e2.astype(np.float64)
    p1, p2 = p0 + e1, p0 + e2
    tmin = np.minimum(np.minimum(p0, p1), p2).astype(np.float32)
    tmax = np.maximum(np.maximum(p0, p1), p2).astype(np.float32)

    lo = tmin.min(0)
    hi = tmax.max(0)
    if S:
        lo = np.minimum(lo, (sph_rows[:S, 1:4] - sph_rows[:S, 4:5]).min(0))
        hi = np.maximum(hi, (sph_rows[:S, 1:4] + sph_rows[:S, 4:5]).max(0))
    shift = (0.5 * (lo.astype(np.float64) + hi)).astype(np.float32)

    top = build_sah_treelets(tmin, tmax, leaf_size=SB_PRIMS)
    B = top.num_leaves

    # per-brick triangle id table [B, 512], -1 = padding, Morton-ordered
    # within the brick so consecutive 32-prim subs have tight AABBs
    morton = morton_codes(0.5 * (tmin.astype(np.float64) + tmax))
    perm = np.full((B, SB_PRIMS), -1, np.int64)
    brick_lo = np.zeros((B, 3), np.float32)
    brick_hi = np.zeros((B, 3), np.float32)
    for b in range(B):
        ids = top.order[top.leaf_start[b]:top.leaf_start[b]
                        + top.leaf_count[b]]
        ids = ids[np.argsort(morton[ids], kind="stable")]
        perm[b, :len(ids)] = ids
        brick_lo[b] = tmin[ids].min(0)
        brick_hi[b] = tmax[ids].max(0)

    valid = perm >= 0
    safe = np.maximum(perm, 0)

    # coefficient slabs, vectorized: [F,10,4] -> [B,16,10,4,32] -> [B,256,128]
    all_c = _tri_coeff(p0 - shift.astype(np.float64), e1, e2)   # [F, 10, 4]
    cp = np.where(valid[:, :, None, None], all_c[safe], 0.0)    # [B,512,10,4]
    cp = cp.reshape(B, NUM_SUBS, SUB_PRIMS, 10, 4)
    cp = cp.transpose(0, 1, 3, 4, 2)                 # [B,16,10,4,32]
    cp = cp.reshape(B, NUM_SUBS, 10, 4 * SUB_PRIMS)  # [B,16,10,128]
    coeff = np.zeros((B, NUM_SUBS, 16, 128), np.float32)
    coeff[:, :, :10, :] = cp
    coeff = coeff.reshape(B, SLAB_ROWS, 128)

    # sub-brick AABBs [B, 16, 8] -> packed [B, 128]
    smin = np.where(valid[:, :, None], tmin[safe], np.inf)
    smax = np.where(valid[:, :, None], tmax[safe], -np.inf)
    smin = smin.reshape(B, NUM_SUBS, SUB_PRIMS, 3).min(2)
    smax = smax.reshape(B, NUM_SUBS, SUB_PRIMS, 3).max(2)
    sub_valid = valid.reshape(B, NUM_SUBS, SUB_PRIMS).any(2)
    subbox = np.zeros((B, NUM_SUBS, 8), np.float32)
    subbox[:, :, 0:3] = np.where(sub_valid[:, :, None], smin, 0.0)
    subbox[:, :, 3:6] = np.where(sub_valid[:, :, None], smax, 0.0)
    subbox[:, :, 6] = sub_valid
    subbox = subbox.reshape(B, 128)

    tri_rows = np.where(valid.reshape(-1)[:, None],
                        tri_rows_src[safe.reshape(-1)],
                        0.0).astype(np.float32)      # [B*512, 32]

    return MX2Set(
        coeff=coeff, subbox=subbox, brick_lo=brick_lo, brick_hi=brick_hi,
        tri_rows=tri_rows, sph_rows=sph_rows, shift=shift,
        bg_r=np.float32(pack.background[0]),
        bg_g=np.float32(pack.background[1]),
        bg_b=np.float32(pack.background[2]),
        light_pos=pack.light_pos.astype(np.float32),
        light_intensity=pack.light_intensity.astype(np.float32),
        scene_lo=lo.astype(np.float32), scene_hi=hi.astype(np.float32),
        num_spheres=S, num_bricks=B)


# --- jax pytree registration (same pattern as BrickSet/MXSet) --------------
_FIELDS = [f.name for f in dataclasses.fields(MX2Set)]
_STATIC = ("num_spheres", "num_bricks")
_LEAVES = tuple(n for n in _FIELDS if n not in _STATIC)


def _flatten(mx: MX2Set):
    return [getattr(mx, n) for n in _LEAVES], tuple(
        getattr(mx, n) for n in _STATIC)


def _unflatten(static, leaves) -> MX2Set:
    kw = dict(zip(_LEAVES, leaves))
    kw.update(dict(zip(_STATIC, static)))
    return MX2Set(**kw)


import jax  # noqa: E402

jax.tree_util.register_pytree_node(MX2Set, _flatten, _unflatten)
