"""MXU brick decomposition: triangles as Plucker coefficient matrices.

The insight that makes ray tracing MXU-shaped: every Moller-Trumbore
quantity is LINEAR in a 10-dim ray feature vector.  With ray features

    F = [o, d, o x d, 1]                       (10 floats per ray)

and a triangle (p0, e1, e2) with n = e1 x e2, the four MT scalars
(shape.cuh:188-215 / ops/geometry.py::intersect_triangle) satisfy

    det     = dot(e1, d x e2)                =  F . [0,       -n,          0,   0]
    u * det = dot(o - p0, d x e2)            =  F . [0,  p0 x e2,         e2,   0]
    v * det = dot(d, (o - p0) x e1)          =  F . [0, -(p0 x e1),      -e1,   0]
    t * det = dot(e2, (o - p0) x e1)         =  F . [n,        0,          0, -p0.n]

(identities: a.(b x c) = c.(a x b) = det[a,b,c]).  So intersecting R rays
against a brick of T triangles is ONE [R,10] x [10,4T] matmul — the op the
TPU's systolic array was built for — followed by a cheap sign-corrected
validity epilogue.  This replaces the per-primitive VPU loop of the brick
tracer with MXU work and, crucially, needs no per-lane gathers at all.

Bricks are binned-SAH treelet leaves (models/sah.py) of up to
``MX_BRICK_PRIMS`` triangles; the traversal level above them is a
brute-force packet-frustum vs brick-AABB cull (ops/mxtrace.py) — at
MX-brick granularity the whole per-scene brick table is small enough that
an interval-arithmetic [packets, bricks] test is cheaper than a tree walk.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np

from ..models.device_scene import _build_prim_rows
from ..models.sah import build_sah_treelets
from ..models.scenepack import ScenePack

MX_BRICK_PRIMS = 128   # triangles per brick (one [10, 512] coeff slab)


@dataclass
class MXSet:
    """Device-ready MXU brick scene (host numpy; registered as a pytree)."""
    # [B, 10, 4*T] f32 coefficient slabs; columns grouped [det | u | v | t]
    coeff: np.ndarray
    brick_lo: np.ndarray     # [B, 3] f32 brick AABB min
    brick_hi: np.ndarray     # [B, 3] f32 brick AABB max
    # megakernel-layout attribute rows (models/device_scene.py::
    # _build_prim_rows) for triangle slot b*T + k; zero rows = padding
    tri_rows: np.ndarray     # [B*T, 32] f32
    sph_rows: np.ndarray     # [S_pad, 32] f32 resident sphere table
    bg_r: np.ndarray
    bg_g: np.ndarray
    bg_b: np.ndarray
    light_pos: np.ndarray        # [L,3] point lights (NEE)
    light_intensity: np.ndarray  # [L,3]
    scene_lo: np.ndarray     # [3] f32 scene AABB (sort-key normalization)
    scene_hi: np.ndarray     # [3]
    num_spheres: int
    num_bricks: int
    brick_prims: int

    @staticmethod
    def from_pack(pack: ScenePack) -> "MXSet":
        return build_mxset(pack)


def _tri_coeff(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> np.ndarray:
    """[T, 10, 4] Plucker coefficient block for T triangles (f64 in, f32
    out).  Feature order: [o(0:3), d(3:6), o x d(6:9), 1(9)]."""
    T = p0.shape[0]
    n = np.cross(e1, e2)
    c = np.zeros((T, 10, 4), np.float64)
    c[:, 3:6, 0] = -n                      # det  = -n . d
    c[:, 6:9, 1] = e2                      # u*det =  e2 . (o x d) + ...
    c[:, 3:6, 1] = np.cross(p0, e2)        #         (p0 x e2) . d
    c[:, 6:9, 2] = -e1                     # v*det = -e1 . (o x d) - ...
    c[:, 3:6, 2] = -np.cross(p0, e1)       #         (p0 x e1) . d
    c[:, 0:3, 3] = n                       # t*det =  n . o - n . p0
    c[:, 9, 3] = -(p0 * n).sum(-1)
    return c.astype(np.float32)


def build_mxset(pack: ScenePack, brick_prims: int = MX_BRICK_PRIMS) -> MXSet:
    S, F = pack.num_spheres, pack.num_triangles
    if F == 0:
        raise ValueError("MX set needs triangles; sphere-only scenes take "
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

    top = build_sah_treelets(tmin, tmax, leaf_size=brick_prims)
    B = top.num_leaves
    T = brick_prims

    coeff = np.zeros((B, 10, 4 * T), np.float32)
    tri_rows = np.zeros((B * T, 32), np.float32)
    brick_lo = np.zeros((B, 3), np.float32)
    brick_hi = np.zeros((B, 3), np.float32)
    all_c = _tri_coeff(p0, e1, e2)           # [F, 10, 4]
    for b in range(B):
        ids = top.order[top.leaf_start[b]:top.leaf_start[b]
                        + top.leaf_count[b]]
        nb = len(ids)
        cb = np.zeros((T, 10, 4), np.float32)
        cb[:nb] = all_c[ids]
        # group columns by quantity: [det(T) | u(T) | v(T) | t(T)]
        coeff[b] = cb.transpose(1, 2, 0).reshape(10, 4 * T)
        tri_rows[b * T:b * T + nb] = tri_rows_src[ids]
        brick_lo[b] = tmin[ids].min(0)
        brick_hi[b] = tmax[ids].max(0)

    lo = np.minimum(tmin.min(0), (sph_rows[:S, 1:4] - sph_rows[:S, 4:5])
                    .min(0) if S else tmin.min(0)).astype(np.float32)
    hi = np.maximum(tmax.max(0), (sph_rows[:S, 1:4] + sph_rows[:S, 4:5])
                    .max(0) if S else tmax.max(0)).astype(np.float32)

    return MXSet(
        coeff=coeff, brick_lo=brick_lo, brick_hi=brick_hi,
        tri_rows=tri_rows, sph_rows=sph_rows,
        bg_r=np.float32(pack.background[0]),
        bg_g=np.float32(pack.background[1]),
        bg_b=np.float32(pack.background[2]),
        light_pos=pack.light_pos.astype(np.float32),
        light_intensity=pack.light_intensity.astype(np.float32),
        scene_lo=lo, scene_hi=hi,
        num_spheres=S, num_bricks=B, brick_prims=T)


# --- jax pytree registration (same pattern as BrickSet) --------------------
_FIELDS = [f.name for f in dataclasses.fields(MXSet)]
_STATIC = ("num_spheres", "num_bricks", "brick_prims")
_LEAVES = tuple(n for n in _FIELDS if n not in _STATIC)


def _flatten(mx: MXSet):
    return [getattr(mx, n) for n in _LEAVES], tuple(
        getattr(mx, n) for n in _STATIC)


def _unflatten(static, leaves) -> MXSet:
    kw = dict(zip(_LEAVES, leaves))
    kw.update(dict(zip(_STATIC, static)))
    return MXSet(**kw)


import jax  # noqa: E402

jax.tree_util.register_pytree_node(MXSet, _flatten, _unflatten)
