"""Quantify brick/top-tree quality: bricks hit per ray and per packet
(the 64x32-pixel tile a brick-tracer grid block traces in lockstep), for
the round-1 Morton-slice decomposition vs the SAH treelet cut
(models/sah.py).  The packet UNION is what the kernel actually pays
(DMA + 512-prim brute force per brick any lane hits) — VERDICT r1 item 9.

Usage: python tools/tree_quality.py [scene.xml]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pathtracer_cuda_interactive_tpu.models.bvh import morton_codes
from pathtracer_cuda_interactive_tpu.models.sah import build_sah_treelets
from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
from pathtracer_cuda_interactive_tpu.ops.camera import Camera, camera_ray_data

W, H = 640, 480
TILE = (64, 32)
BRICK_PRIMS = 512


def tri_bounds(pack):
    p0 = pack.tri_p0.astype(np.float64)
    p1 = p0 + pack.tri_e1
    p2 = p0 + pack.tri_e2
    return (np.minimum(np.minimum(p0, p1), p2),
            np.maximum(np.maximum(p0, p1), p2))


def morton_slice_bricks(tmin, tmax):
    """Round-1 decomposition: global Morton order cut into 512-slices."""
    order = np.argsort(morton_codes(0.5 * (tmin + tmax)), kind="stable")
    F = len(order)
    B = -(-F // BRICK_PRIMS)
    bid = np.arange(F) // BRICK_PRIMS
    bmin = np.full((B, 3), np.inf)
    bmax = np.full((B, 3), -np.inf)
    np.minimum.at(bmin, bid, tmin[order])
    np.maximum.at(bmax, bid, tmax[order])
    return bmin, bmax


def hits(org, dirn, bmin, bmax):
    """[N,B] slab-test hit matrix (t in [0, inf))."""
    inv = 1.0 / np.where(np.abs(dirn) < 1e-30, 1e-30, dirn)
    t0 = (bmin[None] - org[:, None]) * inv[:, None]
    t1 = (bmax[None] - org[:, None]) * inv[:, None]
    tn = np.minimum(t0, t1).max(axis=2)
    tf = np.maximum(t0, t1).min(axis=2)
    return tf >= np.maximum(tn, 0.0)


def packet_stats(name, org, dirn, bmin, bmax, packets):
    h = hits(org, dirn, bmin, bmax)
    per_ray = h.sum(axis=1)
    unions = [h[p].any(axis=0).sum() for p in packets]
    print(f"{name:22s} bricks={len(bmin):5d}  hit/ray={per_ray.mean():7.2f}"
          f"  union/packet={np.mean(unions):7.1f}")
    return per_ray.mean(), float(np.mean(unions))


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/scenes/bunny/bunny.xml"
    pack, parsed = load_scene(scene)
    tmin, tmax = tri_bounds(pack)
    cd = np.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    o, tl, hv, vv = cd.reshape(4, 3)

    # sample rays: 8 random 64x32 tiles of primary rays + the same count
    # of incoherent rays (random origin in scene box, random direction)
    r = np.random.default_rng(0)
    packets, orgs, dirs = [], [], []
    for k in range(8):
        tx = r.integers(0, W // TILE[0])
        ty = r.integers(0, H // TILE[1])
        ii, jj = np.meshgrid(np.arange(TILE[0]) + tx * TILE[0],
                             np.arange(TILE[1]) + ty * TILE[1])
        u = (ii.ravel() + 0.5) / W
        v = (jj.ravel() + 0.5) / H
        d = tl + u[:, None] * hv - v[:, None] * vv - o
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        packets.append(np.arange(len(orgs) * 0, 0))  # placeholder
        orgs.append(np.broadcast_to(o, d.shape).copy())
        dirs.append(d)
    org = np.concatenate(orgs)
    dirn = np.concatenate(dirs)
    n = TILE[0] * TILE[1]
    packets = [np.arange(k * n, (k + 1) * n) for k in range(8)]

    lo = tmin.min(axis=0)
    hi = tmax.max(axis=0)
    m = len(org)
    sorg = r.uniform(lo, hi, (m, 3))
    sdir = r.normal(size=(m, 3))
    sdir /= np.linalg.norm(sdir, axis=1, keepdims=True)

    mor = morton_slice_bricks(tmin, tmax)
    sah = build_sah_treelets(tmin, tmax, leaf_size=BRICK_PRIMS)
    leaves = sah.leaf_of_node >= 0
    sahb = (sah.node_min[leaves].astype(np.float64),
            sah.node_max[leaves].astype(np.float64))

    print(f"== {scene} ({pack.num_triangles} tris) ==")
    print("-- primary rays (coherent 64x32 tiles) --")
    packet_stats("morton-slice r1", org, dirn, *mor, packets)
    packet_stats("SAH treelets r2", org, dirn, *sahb, packets)
    print("-- incoherent rays (random org+dir, packets = arbitrary groups) --")
    packet_stats("morton-slice r1", sorg, sdir, *mor, packets)
    packet_stats("SAH treelets r2", sorg, sdir, *sahb, packets)


if __name__ == "__main__":
    main()
