"""Measure the brick-union cost of SECONDARY bounces on a real scene, and
what inter-bounce ray regrouping would buy (VERDICT r1 item 1 diagnosis).

For 8 random 64x32 primary tiles: compute primary hits (numpy brute
force), cosine-sample one secondary ray per hit, then compare
bricks-union/packet when secondary packets are (a) the original tile
groups vs (b) regrouped by Morton(origin-cell) x direction-octant key.

Usage: python tools/secondary_union.py [scene.xml]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pathtracer_cuda_interactive_tpu.models.sah import build_sah_treelets
from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
from pathtracer_cuda_interactive_tpu.ops.camera import Camera, camera_ray_data
from tools.tree_quality import TILE, W, H, hits, tri_bounds

PACK = 2048


def primary_hits(pack, org, dirn):
    """Nearest-hit positions+normals via chunked numpy Moller-Trumbore."""
    p0 = pack.tri_p0.astype(np.float64)
    e1 = pack.tri_e1.astype(np.float64)
    e2 = pack.tri_e2.astype(np.float64)
    n = len(org)
    best_t = np.full(n, np.inf)
    best_f = np.full(n, -1)
    for lo in range(0, len(p0), 8192):
        P0, E1, E2 = p0[None, lo:lo + 8192], e1[None, lo:lo + 8192], e2[None, lo:lo + 8192]
        d = dirn[:, None]
        o = org[:, None]
        pv = np.cross(d, E2)
        det = (E1 * pv).sum(-1)
        inv = 1.0 / np.where(np.abs(det) < 1e-30, 1e-30, det)
        s = o - P0
        u = (s * pv).sum(-1) * inv
        qv = np.cross(s, E1)
        v = (d * qv).sum(-1) * inv
        t = (E2 * qv).sum(-1) * inv
        ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4) & (t < best_t)
        tm = np.where(ok, t, np.inf)
        j = tm.argmin(1)
        tt = tm[np.arange(n), j]
        better = tt < best_t
        best_t = np.where(better, tt, best_t)
        best_f = np.where(better, lo + j, best_f)
    hit = best_f >= 0
    f = best_f[hit]
    pos = org[hit] + best_t[hit, None] * dirn[hit]
    nrm = np.cross(e1[f], e2[f])
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = np.where((nrm * dirn[hit]).sum(1, keepdims=True) > 0, -nrm, nrm)
    return pos, nrm


def cosine_dirs(nrm, rng):
    u1 = rng.uniform(size=len(nrm))
    u2 = rng.uniform(size=len(nrm))
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    a = np.where(np.abs(nrm[:, 0:1]) > 0.9, [[0, 1, 0]], [[1, 0, 0]])
    t1 = np.cross(nrm, a)
    t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
    t2 = np.cross(nrm, t1)
    z = np.sqrt(np.maximum(1 - u1, 0))
    return (t1 * (r * np.cos(phi))[:, None] + t2 * (r * np.sin(phi))[:, None]
            + nrm * z[:, None])


def union_stats(org, dirn, bmin, bmax, label):
    h = hits(org, dirn, bmin, bmax)
    k = len(org) // PACK
    unions = [h[i * PACK:(i + 1) * PACK].any(axis=0).sum() for i in range(k)]
    print(f"  {label:34s} union/packet = {np.mean(unions):7.1f}"
          f"   (hit/ray {h.sum(1).mean():.2f})")
    return float(np.mean(unions))


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/scenes/bunny/bunny.xml"
    pack, parsed = load_scene(scene)
    tmin, tmax = tri_bounds(pack)
    sah = build_sah_treelets(tmin, tmax, leaf_size=512)
    leaves = sah.leaf_of_node >= 0
    bmin = sah.node_min[leaves].astype(np.float64)
    bmax = sah.node_max[leaves].astype(np.float64)

    cd = np.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    o, tl, hv, vv = cd.reshape(4, 3)
    r = np.random.default_rng(0)
    orgs, dirs = [], []
    for k in range(8):
        tx = r.integers(0, W // TILE[0])
        ty = r.integers(0, H // TILE[1])
        ii, jj = np.meshgrid(np.arange(TILE[0]) + tx * TILE[0],
                             np.arange(TILE[1]) + ty * TILE[1])
        u = (ii.ravel() + 0.5) / W
        v = (jj.ravel() + 0.5) / H
        d = tl + u[:, None] * hv - v[:, None] * vv - o
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        orgs.append(np.broadcast_to(o, d.shape).copy())
        dirs.append(d)
    org = np.concatenate(orgs)
    dirn = np.concatenate(dirs)

    print(f"== {scene}: {pack.num_triangles} tris, {len(bmin)} SAH bricks ==")
    union_stats(org, dirn, bmin, bmax, "primary, tile packets")

    pos, nrm = primary_hits(pack, org, dirn)
    sdir = cosine_dirs(nrm, r)
    sorg = pos + 1e-4 * sdir
    m = (len(sorg) // PACK) * PACK
    sorg, sdir = sorg[:m], sdir[:m]
    print(f"secondary rays: {m}")
    union_stats(sorg, sdir, bmin, bmax, "secondary, original tile order")

    # regroup by Morton(org cell) x direction octant
    lo = tmin.min(0)
    hi = tmax.max(0)
    cell = np.clip(((sorg - lo) / (hi - lo) * 16).astype(np.int64), 0, 15)
    okt = ((sdir[:, 0] > 0).astype(np.int64) * 4
           + (sdir[:, 1] > 0).astype(np.int64) * 2 + (sdir[:, 2] > 0))
    key = ((cell[:, 0] * 16 + cell[:, 1]) * 16 + cell[:, 2]) * 8 + okt
    order = np.argsort(key, kind="stable")
    union_stats(sorg[order], sdir[order], bmin, bmax,
                "secondary, sorted cell x octant")


if __name__ == "__main__":
    main()
