"""Host-side cost-model simulation for the sorted-wavefront brick tracer.

Replays packet-union traversal (the lockstep cost a [P,128] Pallas packet
pays) in vectorized numpy over the real bunny scene, for primary rays and
for secondary bounce rays under different re-packetization strategies:

  * none      — secondary rays stay in their primary packet (today's
                persistent-kernel behavior; the r1 bunny disaster)
  * sorted    — global sort by (direction octant, origin Morton) and
                re-packet (the proposed wavefront)

and reports bricks/chunks visited per packet-bounce plus a µs cost model
for the kernel variants (current VPU brute force / lean VPU / MXU).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
from pathtracer_cuda_interactive_tpu.models.sah import build_sah_treelets
from pathtracer_cuda_interactive_tpu.models.bvh import morton_codes
from pathtracer_cuda_interactive_tpu.ops.camera import Camera, camera_ray_data

SCENE = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/scenes/bunny/bunny.xml"
W, H = 640, 480
LEAF = int(os.environ.get("LEAF", "512"))
PKT = int(os.environ.get("PKT", "2048"))
SUB = 32
N_SAMPLE_PKTS = int(os.environ.get("NPKT", "24"))

rng = np.random.default_rng(7)


def build():
    pack, parsed = load_scene(SCENE)
    p0 = pack.tri_p0.astype(np.float64)
    p1 = p0 + pack.tri_e1
    p2 = p0 + pack.tri_e2
    tmin = np.minimum(np.minimum(p0, p1), p2)
    tmax = np.maximum(np.maximum(p0, p1), p2)
    top = build_sah_treelets(tmin, tmax, leaf_size=LEAF)
    morton = morton_codes(0.5 * (tmin + tmax))
    # per brick: prim ids morton-sorted, chunk AABBs
    bricks = []
    for b in range(top.num_leaves):
        ids = top.order[top.leaf_start[b]: top.leaf_start[b] + top.leaf_count[b]]
        ids = ids[np.argsort(morton[ids], kind="stable")]
        nch = -(-len(ids) // SUB)
        chs = []
        for c in range(nch):
            cid = ids[c * SUB:(c + 1) * SUB]
            chs.append((cid, tmin[cid].min(0), tmax[cid].max(0)))
        bricks.append(chs)
    return pack, parsed, top, bricks, (p0, pack.tri_e1.astype(np.float64),
                                       pack.tri_e2.astype(np.float64))


def slab(bmin, bmax, org, inv, tbest, active):
    t0 = (bmin[None] - org) * inv
    t1 = (bmax[None] - org) * inv
    tn = np.minimum(t0, t1).max(1)
    tf = np.maximum(t0, t1).min(1)
    return (tf >= np.maximum(tn, 0.0)) & (tn <= tbest) & active


def tri_hit(cid, tris, org, dirn, tnear, tbest):
    """Vectorized MT: rays [R,3] x tris cid -> per-ray min t update."""
    p0, e1, e2 = tris
    a, b, c = p0[cid], e1[cid], e2[cid]
    pv = np.cross(dirn[:, None, :], c[None])          # [R,T,3]
    det = np.einsum('tk,rtk->rt', b, pv)
    inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
    tv = org[:, None, :] - a[None]
    u = np.einsum('rtk,rtk->rt', tv, pv) * inv
    qv = np.cross(tv, b[None])
    v = np.einsum('rk,rtk->rt', dirn, qv) * inv
    t = np.einsum('tk,rtk->rt', c, qv) * inv
    ok = (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) \
        & (t > tnear[:, None]) & (t < tbest[:, None])
    t = np.where(ok, t, np.inf)
    j = t.argmin(1)
    tmin = t[np.arange(len(j)), j]
    upd = tmin < tbest
    return np.where(upd, tmin, tbest), np.where(upd, cid[j], -1)


def walk_packet(top, bricks, tris, org, dirn, tnear, active):
    """Near-first ordered union walk; returns (tbest, hit prim, stats)."""
    R = len(org)
    inv = np.where(np.abs(dirn) > 1e-30, 1.0 / dirn, np.inf)
    tbest = np.full(R, np.inf)
    prim = np.full(R, -1, np.int64)
    md = np.where(active[:, None], dirn, 0).sum(0)
    nodes = bricksv = chunks = 0
    stack = [0]
    while stack:
        n = stack.pop()
        nodes += 1
        m = slab(top.node_min[n], top.node_max[n], org, inv, tbest, active)
        if not m.any():
            continue
        b = top.leaf_of_node[n]
        if b >= 0:
            bricksv += 1
            for cid, cmin, cmax in bricks[b]:
                cm = slab(cmin, cmax, org, inv, tbest, active)
                if cm.any():
                    chunks += 1
                    tbest, pr = tri_hit(cid, tris, org, dirn, tnear, tbest)
                    prim = np.where(pr >= 0, pr, prim)
        else:
            left = n + 1
            right = int(top.skip[left])
            ck = lambda q: ((top.node_min[q] + top.node_max[q]) * md).sum()
            near, far = (left, right) if ck(left) <= ck(right) else (right, left)
            stack.append(far)
            stack.append(near)
    return tbest, prim, (nodes, bricksv, chunks)


def cost(stats, t_chunk):
    n, b, c = stats
    return n * 0.15 + b * 0.5 + c * t_chunk  # µs


def main():
    t0 = time.time()
    pack, parsed, top, bricks, tris = build()
    print(f"{SCENE.split('/')[-1]}: {pack.num_triangles} tris, leaf={LEAF} -> "
          f"{top.num_leaves} bricks, {top.num_nodes} nodes, depth {top.depth} "
          f"({time.time()-t0:.1f}s build)")

    cam = Camera.from_parsed(parsed.camera)
    cd = np.asarray(camera_ray_data(cam, W, H), np.float64).reshape(4, 3)
    o, tl, hz, vt = cd

    # primary rays for sampled 64x32 tiles
    tiles_x, tiles_y = W // 64, H // 32
    tids = rng.choice(tiles_x * tiles_y, N_SAMPLE_PKTS, replace=False)
    res_p = {"stats": [], }
    sec_org, sec_dir, sec_key = [], [], []
    ALL_hits = 0
    for tid in tids:
        tx, ty = tid % tiles_x, tid // tiles_x
        ii, jj = np.meshgrid(np.arange(64) + tx * 64, np.arange(32) + ty * 32)
        u = ((ii.ravel() + 0.5) / W)[:, None]
        v = ((jj.ravel() + 0.5) / H)[:, None]
        dirn = tl[None] + u * hz[None] - v * vt[None] - o[None]
        dirn /= np.linalg.norm(dirn, axis=1, keepdims=True)
        org = np.broadcast_to(o, dirn.shape).copy()
        act = np.ones(len(org), bool)
        tb, pr, st = walk_packet(top, bricks, tris, org, dirn,
                                 np.zeros(len(org)), act)
        res_p["stats"].append(st)
        # secondary: cosine sample around geometric normal at hits
        hit = pr >= 0
        ALL_hits += hit.sum()
        if hit.any():
            hp = org[hit] + dirn[hit] * tb[hit, None]
            ng = np.cross(tris[1][pr[hit]], tris[2][pr[hit]])
            ng /= np.linalg.norm(ng, axis=1, keepdims=True)
            ng = np.where((ng * dirn[hit]).sum(1, keepdims=True) > 0, -ng, ng)
            r1, r2 = rng.random(hit.sum()), rng.random(hit.sum())
            st_ = np.sqrt(r1)
            phi = 2 * np.pi * r2
            a = np.where(np.abs(ng[:, 0:1]) > 0.9, [[0, 1, 0]], [[1, 0, 0]])
            tx_ = np.cross(ng, a); tx_ /= np.linalg.norm(tx_, 1, keepdims=True)
            ty_ = np.cross(ng, tx_)
            wd = (tx_ * (np.cos(phi) * st_)[:, None]
                  + ty_ * (np.sin(phi) * st_)[:, None]
                  + ng * np.sqrt(1 - r1)[:, None])
            sec_org.append(hp); sec_dir.append(wd)

    def report(name, stats):
        s = np.array(stats, np.float64)
        mn = s.mean(0)
        print(f"  {name}: nodes {mn[0]:.0f}, bricks {mn[1]:.1f}, "
              f"chunks {mn[2]:.1f}  | cost/pkt: "
              f"vpu5 {cost(mn, 5.0):.0f}µs lean {cost(mn, 4.3):.0f}µs "
              f"mxu {cost(mn, 1.3):.0f}µs")
        return mn

    print(f"PRIMARY ({PKT}-ray tile packets):")
    mp = report("primary", res_p["stats"])

    org = np.concatenate(sec_org); dirn = np.concatenate(sec_dir)
    # unsorted: consecutive packets in original (tile) order
    def run_group(org, dirn, label):
        stats = []
        np_ = min(len(org) // PKT, N_SAMPLE_PKTS)
        for p in range(np_):
            sl = slice(p * PKT, (p + 1) * PKT)
            act = np.ones(PKT, bool)
            _, _, st = walk_packet(top, bricks, tris, org[sl], dirn[sl],
                                   np.full(PKT, 1e-4), act)
            stats.append(st)
        return report(label, stats)

    print(f"SECONDARY bounce-1 ({len(org)} rays of {N_SAMPLE_PKTS*PKT}):")
    m_uns = run_group(org, dirn, "unsorted (tile order)")

    # sorted by (octant, origin morton within scene bbox)
    smin = np.minimum(top.node_min[0], org.min(0))
    smax = np.maximum(top.node_max[0], org.max(0))
    q = np.clip(((org - smin) / np.maximum(smax - smin, 1e-9) * 1023), 0,
                1023).astype(np.uint64)
    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x
    m = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    octa = ((dirn[:, 0] > 0).astype(np.uint64) * 4
            + (dirn[:, 1] > 0).astype(np.uint64) * 2
            + (dirn[:, 2] > 0))
    key = (octa << 30) | (m >> np.uint64(0))
    order = np.argsort(key)
    m_srt = run_group(org[order], dirn[order], "sorted (octant+morton)")

    key2 = (m << np.uint64(3)) | octa
    order2 = np.argsort(key2)
    m_srt2 = run_group(org[order2], dirn[order2], "sorted (morton+octant)")

    # frame estimate: bunny avg path ~ use hit fraction as continuation prob
    ph = ALL_hits / (len(tids) * PKT)
    avg_b = 1 / max(1e-9, 1 - ph * 0.7)  # crude: albedo*hit continuation
    n_pkts = (W * H * 2) / PKT
    for nm, mm in (("lean+sorted", m_srt), ("mxu+sorted", m_srt)):
        tc = 4.3 if nm.startswith("lean") else 1.3
        frame = n_pkts * (cost(mp, tc) + (avg_b - 1) * cost(mm, tc)) / 1e6
        print(f"  est {nm}: frame {frame*1e3:.1f} ms -> "
              f"{W*H*2/frame/1e6:.1f} Msamples/s (avg_bounces~{avg_b:.1f})")


if __name__ == "__main__":
    main()
