"""Round-5 attribution for the SHIPPED bunny config (slim + sig_mort).

VERDICT r4 ask #1: before designing the next kernel, measure where the
~0.7 s/frame goes under the configuration that actually ships —
640x480x2spp, slim walk, target-signature sort.  Per wave this reports:

  * live rays and live packets (packets holding >=1 live ray after the
    sig_mort sort — the prefix a live-count-aware launch would run);
  * chip-side trace time (reps pipelined between readbacks, so the
    26-29 ms tunnel round trip does not pollute per-wave numbers);
  * sort time and shade(+record-recovery) time;
  * the all-dead-grid floor: the same launch with zero live rays — what
    every trailing dead packet costs today (walk exits at the root test);
  * pair-census under the sig_mort order, with and without a per-ray
    t-cap (min(oracle hit t, root-box exit t)) — evaluates VERDICT's
    design (b): whether a best-t-capped pair grid could beat the walk.

Usage: python tools/probe_r5.py [scene.xml] [depths]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathtracer_cuda_interactive_tpu.utils.config import setup_jax
setup_jax()

SCENE = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/scenes/bunny/bunny.xml"
DEPTHS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
W, H, SPP = 640, 480, 2
REPS = 4


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from pathtracer_cuda_interactive_tpu.models.bricks import (
        BRICK_DATA_ROWS, BrickSet)
    from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
    from pathtracer_cuda_interactive_tpu.ops import rng, wavefront
    from pathtracer_cuda_interactive_tpu.ops.camera import (Camera,
                                                            camera_ray_data)
    from pathtracer_cuda_interactive_tpu.ops.pairtrace import _interval_cull
    from pathtracer_cuda_interactive_tpu.ops.vec import Vec3
    from pathtracer_cuda_interactive_tpu.ops.wavefront import (
        SECONDARY_TNEAR, WAVE_ROWS, _record_from_slots, _shade, _sig_key,
        _trace_wave_slim, _wave_layout)

    pack, parsed = load_scene(SCENE)
    bs = jax.device_put(BrickSet.from_pack(pack))
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    B, S = bs.num_bricks, bs.num_spheres
    print(f"bricks={B} spheres={S} WAVE_ROWS={WAVE_ROWS}")

    pix_slots, _ = _wave_layout(W, H)
    n = pix_slots.shape[0]
    pix1 = jnp.asarray(pix_slots)
    pix = jnp.tile(pix1, SPP)
    samp = jnp.repeat(jnp.arange(SPP, dtype=jnp.uint32), n)
    rows = (n * SPP) // 128
    shape = (rows, 128)
    pix2 = pix.reshape(shape)
    R = W * H
    n_packets = rows // WAVE_ROWS
    print(f"rays={rows * 128} rows={rows} packets={n_packets}")

    tri_rows = jnp.asarray(bs.brick_data)[:, :BRICK_DATA_ROWS, :].reshape(
        -1, 32)
    bg3 = Vec3(jnp.float32(bs.bg_r), jnp.float32(bs.bg_g),
               jnp.float32(bs.bg_b))
    root = np.asarray(bs.top_boxes)[0, :6]
    lo, hi = root[:3], root[3:]
    inv = 1.0 / np.maximum(hi - lo, 1e-12)
    coarse = jnp.asarray(bs.coarse_boxes)

    @jax.jit
    def start_wave():
        state = rng.seed_rays(pix2.astype(jnp.uint32), samp.reshape(shape),
                              1984)
        state, u1 = rng.next_uniform(state)
        state, u2 = rng.next_uniform(state)
        i = (pix2 % W).astype(jnp.float32)
        j = (pix2 // W).astype(jnp.float32)
        org, dirn = wavefront.camera_rays(cd, (i + u1) / W, (j + u2) / H)
        active = pix2 < R
        return org, dirn, active, state

    # tnear rides as a traced scalar (the kernel reads it from SMEM), so
    # primary and secondary waves share ONE Mosaic compile
    trace = jax.jit(
        lambda tn, ox, oy, oz, dx, dy, dz, act: _trace_wave_slim(
            bs.sph_rows, bs.top_boxes, bs.top_links, bs.brick_data, tn,
            ox, oy, oz, dx, dy, dz, act, S))

    # R5_STATS=1: additionally run the 17-channel kernel per wave —
    # attributes selected IN-KERNEL (no XLA gather) + per-packet
    # (nodes, bricks, chunks) counters.  Measures the walk-cost census
    # AND what the record-recovery-in-kernel variant would cost.
    STATS = os.environ.get("R5_STATS", "0") == "1"
    if STATS:
        from pathtracer_cuda_interactive_tpu.ops.wavefront import _trace_wave

        def _stats_impl(tn, ox, oy, oz, dx, dy, dz, act):
            outs = _trace_wave(bs.sph_rows, bs.top_boxes, bs.top_links,
                               bs.brick_data, tn, ox, oy, oz, dx, dy, dz,
                               act, S, collect_stats=True)
            return outs[0], outs[16]   # t, stats channel
        trace_stats = jax.jit(_stats_impl)

        def report_stats(tag, tnear, org, dirn, act_f):
            t, sv = trace_stats(tnear, org.x, org.y, org.z,
                                dirn.x, dirn.y, dirn.z, act_f)
            sync(t)
            t0 = time.perf_counter()
            for _ in range(REPS):
                t, sv = trace_stats(tnear, org.x, org.y, org.z,
                                    dirn.x, dirn.y, dirn.z, act_f)
            sync(t)
            dt = (time.perf_counter() - t0) / REPS * 1e3
            s = np.asarray(sv).reshape(n_packets, WAVE_ROWS, 128)
            nodes, bricks, chunks = s[:, 0, 0], s[:, 1, 0], s[:, 2, 0]
            print(f"  [{tag}] 16ch trace={dt:7.2f} ms  per-pkt nodes "
                  f"{nodes.mean():6.1f}/{nodes.max():5.0f}  bricks "
                  f"{bricks.mean():5.1f}/{bricks.max():4.0f}  chunks "
                  f"{chunks.mean():6.1f}/{chunks.max():5.0f}  totals "
                  f"n={nodes.sum():.0f} b={bricks.sum():.0f} "
                  f"c={chunks.sum():.0f}", flush=True)

    @jax.jit
    def shade(t, slot, org, dirn, T, L, active, state, depth, tnear):
        rec = _record_from_slots(tri_rows, bs.sph_rows, S, t, slot, org,
                                 dirn, tnear, active)
        return _shade(rec, org, dirn, T, L, active, state, depth, bg3, 5, 50)

    @jax.jit
    def sort_wave(org, dirn, T, L, active, state):
        key = _sig_key(org, dirn, active, jnp.asarray(lo), jnp.asarray(inv),
                       coarse)
        flat = lambda a: a.reshape(-1)
        cols = lax.sort(
            (flat(key), flat(org.x), flat(org.y), flat(org.z),
             flat(dirn.x), flat(dirn.y), flat(dirn.z), flat(T.x), flat(T.y),
             flat(T.z), flat(L.x), flat(L.y), flat(L.z), flat(state),
             flat(jnp.where(active, 1.0, 0.0))), num_keys=1)
        (ox, oy, oz, dx, dy, dz, Tx, Ty, Tz, Lx, Ly, Lz, st,
         af) = (c.reshape(shape) for c in cols[1:])
        return (Vec3(ox, oy, oz), Vec3(dx, dy, dz), Vec3(Tx, Ty, Tz),
                Vec3(Lx, Ly, Lz), af > 0.0, st)

    def sync(x):
        return float(np.asarray(x[:1, :1]).sum())

    def timed_trace(tnear, org, dirn, act_f, reps=REPS):
        # warm once (also ensures compile outside the timed region)
        t, slot = trace(tnear, org.x, org.y, org.z, dirn.x, dirn.y, dirn.z,
                        act_f)
        sync(t)
        t0 = time.perf_counter()
        for _ in range(reps):
            t, slot = trace(tnear, org.x, org.y, org.z,
                            dirn.x, dirn.y, dirn.z, act_f)
        sync(t)
        dt = (time.perf_counter() - t0) / reps
        return t, slot, dt * 1e3

    def pair_census(org, dirn, active, t_oracle, label):
        """Brick-pair counts under the CURRENT (already sorted) order:
        plain cull vs a per-ray tmax cap = min(oracle hit t, root exit t).
        The capped count bounds what a pair grid with per-pair best-t
        early-out could achieve if pruning were perfect."""
        pr = WAVE_ROWS
        P = rows // pr
        rp = lambda a: a.reshape(P, pr * 128)
        o = Vec3(rp(org.x), rp(org.y), rp(org.z))
        d = Vec3(rp(dirn.x), rp(dirn.y), rp(dirn.z))
        a = rp(jnp.where(active, 1.0, 0.0)) > 0
        f = jax.jit(_interval_cull, static_argnames=("tnear",))
        ent = f(o, d, a, jnp.asarray(bs.brick_lo), jnp.asarray(bs.brick_hi),
                0.0)
        plain = int(np.isfinite(np.asarray(ent)).sum())

        # root-box exit per ray (inf if the ray misses the root box)
        invd = Vec3(1.0 / dirn.x, 1.0 / dirn.y, 1.0 / dirn.z)
        t0s = [(lo[k] - getattr(org, c)) * getattr(invd, c)
               for k, c in enumerate("xyz")]
        t1s = [(hi[k] - getattr(org, c)) * getattr(invd, c)
               for k, c in enumerate("xyz")]
        tns = [jnp.minimum(a_, b_) for a_, b_ in zip(t0s, t1s)]
        tfs = [jnp.maximum(a_, b_) for a_, b_ in zip(t0s, t1s)]
        tn = jnp.maximum(jnp.maximum(tns[0], tns[1]), tns[2])
        tf = jnp.minimum(jnp.minimum(tfs[0], tfs[1]), tfs[2])
        root_exit = jnp.where(tf >= jnp.maximum(tn, 0.0), tf, 0.0)
        cap = jnp.minimum(t_oracle, root_exit)
        # pair survives the cap if any live ray's entry <= its cap
        ent2 = _capped_pairs(o, d, a, rp(cap),
                             jnp.asarray(bs.brick_lo),
                             jnp.asarray(bs.brick_hi))
        capped = int(np.asarray(ent2).sum())
        print(f"  [{label}] brick_pairs plain={plain:7d} "
              f"({plain / P:6.1f}/pkt)  t-capped={capped:7d} "
              f"({capped / P:6.1f}/pkt)")

    @jax.jit
    def _capped_pairs(o, d, a, cap, blo, bhi):
        inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
        Bn = blo.shape[0]

        def body(bi, acc):
            tx0 = (blo[bi, 0] - o.x) * inv.x
            tx1 = (bhi[bi, 0] - o.x) * inv.x
            ty0 = (blo[bi, 1] - o.y) * inv.y
            ty1 = (bhi[bi, 1] - o.y) * inv.y
            tz0 = (blo[bi, 2] - o.z) * inv.z
            tz1 = (bhi[bi, 2] - o.z) * inv.z
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                         jnp.maximum(ty0, ty1)),
                             jnp.maximum(tz0, tz1))
            hit = (tf >= jnp.maximum(tn, 0.0)) & (tn <= cap) & a
            return acc + jnp.any(hit, axis=1).astype(jnp.int32)

        return lax.fori_loop(0, Bn, body, jnp.zeros((o.x.shape[0],),
                                                    jnp.int32))

    # ---- the frame, wave by wave --------------------------------------
    org, dirn, active, state = start_wave()
    T = Vec3.full(shape, (1.0, 1.0, 1.0))
    L = Vec3.zeros(shape)

    # dead-grid floor: full launch, zero live rays
    zf = jnp.zeros(shape, jnp.float32)
    _, _, dead_ms = timed_trace(SECONDARY_TNEAR, org, dirn, zf)
    print(f"all-dead grid launch: {dead_ms:7.2f} ms "
          f"({dead_ms * 1e3 / n_packets:5.1f} us/packet)")

    total_trace = total_sort = total_shade = 0.0
    for depth in range(DEPTHS):
        if depth > 0:
            # warm/compile; re-sorting sorted data is a no-op (stable sort)
            org, dirn, T, L, active, state = sort_wave(org, dirn, T, L,
                                                       active, state)
            sync(T.x)
            t0 = time.perf_counter()
            for _ in range(REPS):
                org, dirn, T, L, active, state = sort_wave(org, dirn, T, L,
                                                           active, state)
            sync(T.x)
            sort_ms = (time.perf_counter() - t0) / REPS * 1e3
        else:
            sort_ms = 0.0
        live = int(np.asarray(active).sum())
        if live == 0:
            print(f"wave {depth}: live=0 — stop")
            break
        lp = np.asarray(active).reshape(n_packets, -1).any(axis=1).sum()
        act_f = jnp.where(active, 1.0, 0.0)
        tnear = 0.0 if depth == 0 else SECONDARY_TNEAR
        t, slot, tr_ms = timed_trace(tnear, org, dirn, act_f)

        # warm (compile) shade outside the timed region
        shade(t, slot, org, dirn, T, L, active, state, jnp.int32(depth),
              tnear)
        t0 = time.perf_counter()
        for _ in range(REPS):
            o2, d2, T2, L2, a2, s2 = shade(t, slot, org, dirn, T, L, active,
                                           state, jnp.int32(depth), tnear)
        sync(L2.x)
        sh_ms = (time.perf_counter() - t0) / REPS * 1e3

        print(f"wave {depth}: live={live:7d} ({live / (rows * 128) * 100:5.1f}%)"
              f" live_pkts={int(lp):4d}/{n_packets}"
              f" trace={tr_ms:7.2f} ms sort={sort_ms:6.2f} ms"
              f" shade={sh_ms:6.2f} ms", flush=True)
        if STATS and depth <= 4:
            report_stats(f"wave{depth}", tnear, org, dirn, act_f)
        if depth in (1, 2) and not STATS:
            pair_census(org, dirn, active, t, f"wave{depth}")
        total_trace += tr_ms
        total_sort += sort_ms
        total_shade += sh_ms
        org, dirn, T, L, active, state = o2, d2, T2, L2, a2, s2

    print(f"TOTAL  trace={total_trace:7.1f} ms  sort={total_sort:6.1f} ms"
          f"  shade={total_shade:6.1f} ms")


if __name__ == "__main__":
    main()
