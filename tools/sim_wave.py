"""Full-frame bounce-wave simulation: packet-union costs per bounce under
re-packetization strategies, on the real bunny geometry.

Strategies per bounce wave (all bounce-synchronous):
  fixed    — rays keep their primary-tile packet slot; dead lanes masked
  compact  — stable partition: live rays re-packeted contiguously
  c+oct    — compact, then stable sort by direction octant
  c+mort   — compact, then stable sort by (origin morton high bits, octant)

Cost model per packet: nodes*0.15 + bricks*0.5 + chunks*t_chunk (µs).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # sibling sim_union
import numpy as np
from sim_union import build, walk_packet, cost, W, H, PKT, SCENE

MAX_B = 6
CONT_P = 0.75          # continuation probability after a hit (crude RR)
rng = np.random.default_rng(3)


def cosine_bounce(org, dirn, t, prim, tris):
    hp = org + dirn * t[:, None]
    ng = np.cross(tris[1][prim], tris[2][prim])
    ng /= np.maximum(np.linalg.norm(ng, axis=1, keepdims=True), 1e-30)
    ng = np.where((ng * dirn).sum(1, keepdims=True) > 0, -ng, ng)
    r1, r2 = rng.random(len(hp)), rng.random(len(hp))
    st = np.sqrt(r1); phi = 2 * np.pi * r2
    a = np.where(np.abs(ng[:, 0:1]) > 0.9, [[0., 1, 0]], [[1., 0, 0]])
    tx = np.cross(ng, a); tx /= np.linalg.norm(tx, axis=1, keepdims=True)
    ty = np.cross(ng, tx)
    wd = (tx * (np.cos(phi) * st)[:, None] + ty * (np.sin(phi) * st)[:, None]
          + ng * np.sqrt(1 - r1)[:, None])
    return hp, wd


def trace_wave(top, bricks, tris, org, dirn, tnear, active):
    """Trace all packets of a wave; returns per-ray (t, prim) + stats list."""
    n_pkt = len(org) // PKT
    t_all = np.full(len(org), np.inf)
    p_all = np.full(len(org), -1, np.int64)
    stats = []
    for p in range(n_pkt):
        sl = slice(p * PKT, (p + 1) * PKT)
        if not active[sl].any():
            continue
        tb, pr, st = walk_packet(top, bricks, tris, org[sl], dirn[sl],
                                 tnear[sl], active[sl])
        t_all[sl], p_all[sl] = tb, pr
        stats.append(st)
    return t_all, p_all, stats


def main():
    t0 = time.time()
    pack, parsed, top, bricks, tris = build()
    print(f"{pack.num_triangles} tris -> {top.num_leaves} bricks "
          f"({time.time()-t0:.0f}s)")
    from pathtracer_cuda_interactive_tpu.ops.camera import (Camera,
                                                            camera_ray_data)
    cam = Camera.from_parsed(parsed.camera)
    cd = np.asarray(camera_ray_data(cam, W, H), np.float64).reshape(4, 3)
    o, tl, hz, vt = cd
    tiles_x = W // 64
    n_pkt = (W // 64) * (H // 32)
    # primary rays in tile order
    blk = np.arange(n_pkt * PKT)
    b_, l_ = blk // PKT, blk % PKT
    tx, ty = b_ % tiles_x, b_ // tiles_x
    ii = tx * 64 + l_ % 64
    jj = ty * 32 + (l_ // 64)
    u = ((ii + 0.5) / W)[:, None]; v = ((jj + 0.5) / H)[:, None]
    dirn = tl[None] + u * hz[None] - v * vt[None] - o[None]
    dirn /= np.linalg.norm(dirn, axis=1, keepdims=True)
    org = np.broadcast_to(o, dirn.shape).astype(np.float64).copy()

    for strat in ("fixed", "compact", "c+oct", "c+mort"):
        O, D = org.copy(), dirn.copy()
        act = np.ones(len(O), bool)
        tn = np.zeros(len(O))
        tot = {"lean": 0.0, "mxu": 0.0}
        line = []
        t0 = time.time()
        for b in range(MAX_B):
            t, pr, stats = trace_wave(top, bricks, tris, O, D, tn, act)
            s = np.array(stats, np.float64).sum(0)
            tot["lean"] += cost(s, 4.3); tot["mxu"] += cost(s, 1.3)
            line.append(f"b{b}:{len(stats)}p/{int(s[1])}br/{int(s[2])}ch")
            hit = act & (pr >= 0)
            cont = hit & (rng.random(len(O)) < CONT_P)
            if not cont.any():
                break
            hp, wd = cosine_bounce(O[cont], D[cont], t[cont], pr[cont], tris)
            O[cont], D[cont] = hp, wd
            act = cont
            tn = np.full(len(O), 1e-4)
            if strat != "fixed":
                keys = np.zeros(len(O), np.uint64)
                if strat == "c+oct":
                    keys = ((D[:, 0] > 0) * 4 + (D[:, 1] > 0) * 2
                            + (D[:, 2] > 0)).astype(np.uint64)
                elif strat == "c+mort":
                    smin, smax = top.node_min[0], top.node_max[0]
                    q = np.clip((O - smin) / np.maximum(smax - smin, 1e-9)
                                * 31, 0, 31).astype(np.uint64)
                    keys = (((q[:, 0] * 32 + q[:, 1]) * 32 + q[:, 2]) * 8
                            + ((D[:, 0] > 0) * 4 + (D[:, 1] > 0) * 2
                               + (D[:, 2] > 0)).astype(np.uint64))
                order = np.argsort(np.where(act, keys, np.uint64(1 << 62)),
                                   kind="stable")
                O, D, act, tn = O[order], D[order], act[order], tn[order]
        spp_s = (W * H) / (tot["lean"] / 1e6) / 1e6
        spp_m = (W * H) / (tot["mxu"] / 1e6) / 1e6
        print(f"{strat:8s} lean {tot['lean']/1e3:7.1f} ms/wave-set "
              f"({spp_s:5.1f} Msam/s) | mxu {tot['mxu']/1e3:7.1f} ms "
              f"({spp_m:5.1f} Msam/s) [{time.time()-t0:.0f}s sim]")
        print("   ", " ".join(line))


if __name__ == "__main__":
    main()
