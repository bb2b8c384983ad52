"""In-jit hardware probes: dispatch-floor-free device timings.

tools/probe_hw.py showed every sub-10ms measurement saturates at the
~8 ms per-dispatch floor of the tunneled platform.  Here each probe runs
REPS data-dependent repetitions inside ONE jit (fori_loop whose carry
feeds the next iteration), so per-iteration device time is
(t_call - overhead) / REPS with overhead amortized away.  Large operands
are jit ARGUMENTS (a closure constant of GB size explodes HLO
serialization and never finishes compiling).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402
from jax import lax             # noqa: E402

from pathtracer_cuda_interactive_tpu.utils.config import setup_jax  # noqa
setup_jax()

REPS = 10
R = 614400
M, B = 4800, 576


def timed_call(f, *args):
    out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).sum())   # warm + sync
    t0 = time.perf_counter()
    out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).sum())
    return (time.perf_counter() - t0) / REPS


def rep(body):
    """jit of REPS dependent iterations of body(carry, data, k) -> carry."""
    @jax.jit
    def run(c0, *data):
        return lax.fori_loop(0, REPS, lambda k, c: body(c, k, *data), c0)
    return run


def report(name, ms, **kw):
    print(json.dumps({"probe": name, "ms": round(ms * 1e3, 3), **kw}),
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    z = jnp.float32(0)

    # HBM read bandwidth
    big = jnp.ones((R, 512), jnp.float32)          # 1.26 GB
    t = timed_call(rep(lambda c, k, b: c + (b * (1.0 + c * 1e-30)).sum()),
                   z, big)
    report("hbm_read", t, gb_s=round(1.258 / t, 1))

    # VPU chain: 50 elementwise ops on a wave-sized array
    x0 = jax.random.normal(key, (M, 128), jnp.float32)

    def vpu_body(c, k):
        y = c
        for _ in range(25):
            y = y * 1.0001 + 0.5
            y = jnp.maximum(y, 0.1)
        return y
    t = timed_call(rep(vpu_body), x0)
    report("vpu_chain_50ops", t, tops=round(50 * x0.size / t / 1e12, 3))

    # MXU K=10 Plucker, fused epilogue, wave-sized
    a0 = jax.random.normal(key, (R, 10), jnp.float32)
    b0 = jax.random.normal(key, (10, 512), jnp.float32)

    def mx_body(c, k, a0, b0):
        a = a0 + c * 1e-30
        out = jnp.dot(a, b0, preferred_element_type=jnp.float32)
        det = out[:, 0:128]
        tt = out[:, 384:512] / jnp.where(det == 0, 1.0, det)
        return c + jnp.min(jnp.where(tt > 0, tt, np.inf), axis=-1).sum()
    t = timed_call(rep(mx_body), z, a0, b0)
    report("mx_k10_fused", t, tflops=round(2 * R * 10 * 512 / t / 1e12, 2))

    # one [16,128]^T x [16,128] HIGHEST pass + epilogue-ish sum (the mx2
    # kernel's unit) — REPS*2000 passes to resolve per-pass cost
    c0 = jax.random.normal(key, (16, 128), jnp.float32)
    f0 = jax.random.normal(key, (16, 128), jnp.float32)

    def mxp_body(c, k, c0, f0):
        def inner(j, acc):
            out = lax.dot_general(c0 + acc * 1e-30, f0,
                                  (((0,), (0,)), ((), ())),
                                  precision=lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
            return acc + out[0, 0]
        return lax.fori_loop(0, 2000, inner, c)
    t = timed_call(rep(mxp_body), z, c0, f0)
    report("one_16x128_pass_HIGHEST", t / 2000.0)

    # cull-order candidates on [M, B]
    lb0 = jax.random.uniform(key, (M, B), jnp.float32)

    def argsort_body(c, k, lb0):
        lb = lb0 + c * 1e-30
        order = jnp.argsort(lb, axis=1)
        slb = jnp.take_along_axis(lb, order, axis=1)
        return c + slb[:, 0].sum() + order[:, 0].sum()
    t = timed_call(rep(argsort_body), z, lb0)
    report("cull_argsort_4800x576", t)

    def sortpair_body(c, k, lb0):
        lb = lb0 + c * 1e-30
        io = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[None, :],
                              (M, B))
        slb, order = lax.sort((lb, io), num_keys=1, dimension=1)
        return c + slb[:, 0].sum() + order[:, 0].sum()
    t = timed_call(rep(sortpair_body), z, lb0)
    report("cull_sortpair_4800x576", t)

    def cummin_body(c, k, lb0):
        lb = lb0 + c * 1e-30
        smin = lax.cummin(lb, axis=1, reverse=True)
        return c + smin[:, 0].sum()
    t = timed_call(rep(cummin_body), z, lb0)
    report("cull_suffix_cummin", t)

    # the wavefront inter-bounce sort: 614k rays x 16 columns
    keys0 = jax.random.randint(key, (R,), 0, 1 << 30, jnp.int32)
    cols0 = jax.random.normal(key, (15, R), jnp.float32)

    def wsort_body(c, k, keys0, cols0):
        kk = keys0 + k
        parts = lax.sort((kk,) + tuple(cols0[i] + c * 1e-30
                                       for i in range(15)), num_keys=1)
        return c + parts[1][0] + parts[15][0]
    t = timed_call(rep(wsort_body), z, keys0, cols0)
    report("wave_sort_16col", t)

    # gather of [R] rows from a [32768, 16] table
    tbl = jax.random.normal(key, (32768, 16), jnp.float32)
    idx0 = jax.random.randint(key, (R,), 0, 32768, jnp.int32)

    def gather_body(c, k, tbl, idx0):
        g = jnp.take(tbl, idx0 + k * 0, axis=0)
        return c + g.sum()
    t = timed_call(rep(gather_body), z, tbl, idx0)
    report("gather_614k_rows16", t, ns_per_row=round(t / R * 1e9, 2))

    # attribute gather shape: [R] rows from [B*512, 32]
    tbl2 = jax.random.normal(key, (288000, 32), jnp.float32)
    idx2 = jax.random.randint(key, (R,), 0, 288000, jnp.int32)
    t = timed_call(rep(gather_body), z, tbl2, idx2)
    report("gather_614k_rows32_bigtbl", t, ns_per_row=round(t / R * 1e9, 2))

    # segment_sum (the image scatter)
    vals = jax.random.normal(key, (R,), jnp.float32)
    seg = jax.random.randint(key, (R,), 0, 307200, jnp.int32)

    def seg_body(c, k, vals, seg):
        return c + jax.ops.segment_sum(vals + c * 1e-30, seg,
                                       num_segments=307201).sum()
    t = timed_call(rep(seg_body), z, vals, seg)
    report("segment_sum_614k", t)

    report("done", 0.0)


if __name__ == "__main__":
    main()
