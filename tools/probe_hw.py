"""Hardware cost-model probes for the large-scene tracer design.

Every timing here syncs through an actual device->host readback of a
scalar reduction: on the tunneled axon platform, ``block_until_ready``
returns before execution finishes, so timings that rely on it (including
round-2's tools/microbench_sort.py) can be wildly optimistic.  The
dependency chain (acc = acc + out) guarantees all N executions completed
before the final readback.

Probes:
  1. HBM bandwidth          — elementwise read of a 1.26 GB array
  2. gather throughput      — jnp.take of [R] rows from [N, 8/16/32] f32
  3. MXU K=10 matmul        — the Plucker intersection op, fused epilogue
  4. lax.sort               — 614k keys, 1 vs 15 payload columns
  5. VPU chain              — 50-op elementwise on wave-sized arrays
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

from pathtracer_cuda_interactive_tpu.utils.config import setup_jax  # noqa: E402
setup_jax()


def timed(f, *args, n=5):
    """Mean seconds per execution, synced by chained readback."""
    acc = f(*args)
    float(np.asarray(acc))      # warm (compile) + sync
    t0 = time.perf_counter()
    acc = None
    for _ in range(n):
        o = f(*args)
        acc = o if acc is None else acc + o
    float(np.asarray(acc))
    return (time.perf_counter() - t0) / n


def report(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


R = 614400          # rays per bunny wave at 640x480x2spp


def main():
    key = jax.random.PRNGKey(0)

    # 1. HBM bandwidth
    big = jnp.ones((R, 512), jnp.float32)        # 1.26 GB
    f = jax.jit(lambda b: (b * 2.0).sum())
    t = timed(f, big, n=4)
    report("hbm_read", ms=round(t * 1e3, 3), gb_s=round(1.258 / t, 1))

    # 2. gather: traversal-step shaped
    for N, W in ((32768, 8), (32768, 16), (65536, 32), (2048, 8)):
        tbl = jax.random.normal(key, (N, W), jnp.float32)
        idx = jax.random.randint(key, (R,), 0, N, jnp.int32)
        f = jax.jit(lambda t_, i_: jnp.take(t_, i_, axis=0).sum())
        t = timed(f, tbl, idx, n=4)
        gb = R * W * 4 / 1e9
        report("gather", table=[N, W], ms=round(t * 1e3, 3),
               eff_gb_s=round(gb / t, 1), ns_per_row=round(t / R * 1e9, 2))

    # 3. MXU Plucker op: [R,10] x [10,512] with fused validity epilogue
    a = jax.random.normal(key, (R, 10), jnp.float32)
    b = jax.random.normal(key, (10, 512), jnp.float32)

    def plucker(a, b):
        out = jnp.dot(a, b, preferred_element_type=jnp.float32)
        det = out[:, 0:128]
        tt = out[:, 384:512] / jnp.where(det == 0, 1.0, det)
        return jnp.min(jnp.where(tt > 0, tt, np.inf), axis=-1).sum()

    t = timed(jax.jit(plucker), a, b, n=4)
    report("mx_plucker_fused", ms=round(t * 1e3, 3),
           tflops=round(2 * R * 10 * 512 / t / 1e12, 2))

    ab = a.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    t = timed(jax.jit(plucker), ab, bb, n=4)
    report("mx_plucker_fused_bf16", ms=round(t * 1e3, 3))

    # unfused (materialize [R,512]) for comparison
    f = jax.jit(lambda a, b: jnp.dot(a, b,
                                     preferred_element_type=jnp.float32).sum())
    t = timed(f, a, b, n=4)
    report("mx_plucker_materialized", ms=round(t * 1e3, 3))

    # batched per-packet coeff (the _mx_rounds shape), fused epilogue
    M, P, T = R // 128, 128, 128
    fa = jax.random.normal(key, (M, P, 10), jnp.float32)
    cf = jax.random.normal(key, (M, 10, 4 * T), jnp.float32)

    def batched(fa, cf):
        out = jax.lax.dot_general(fa, cf, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        det = out[..., :T]
        tt = out[..., 3 * T:] / jnp.where(det == 0, 1.0, det)
        return jnp.min(jnp.where(tt > 0, tt, np.inf), axis=-1).sum()

    t = timed(jax.jit(batched), fa, cf, n=3)
    report("mx_batched_fused", ms=round(t * 1e3, 3))

    # 4. sort cost at wave size
    keys = jax.random.randint(key, (R,), 0, 1 << 30, jnp.int32)
    cols = [jax.random.normal(key, (R,), jnp.float32) for _ in range(15)]
    f1 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0].sum())
    t = timed(f1, keys, n=3)
    report("sort_keys_only", ms=round(t * 1e3, 3))

    fK = jax.jit(lambda k, *c: sum(
        x.sum() for x in jax.lax.sort((k,) + c, num_keys=1)[1:]))
    t = timed(fK, keys, *cols, n=3)
    report("sort_15_payloads", ms=round(t * 1e3, 3))

    def argsort_gather(k, *c):
        idx = jnp.argsort(k)
        return sum(jnp.take(x, idx, axis=0).sum() for x in c)
    t = timed(jax.jit(argsort_gather), keys, *cols, n=3)
    report("argsort_plus_gathers", ms=round(t * 1e3, 3))

    # 5. VPU chain
    x = jax.random.normal(key, (4800, 2048), jnp.float32)

    def vchain(x):
        y = x
        for _ in range(25):
            y = y * 1.0001 + 0.5
            y = jnp.maximum(y, 0.1)
        return y.sum()

    t = timed(jax.jit(vchain), x, n=4)
    report("vpu_chain_50ops", ms=round(t * 1e3, 3),
           tops=round(50 * x.size / t / 1e12, 2))

    report("done")


if __name__ == "__main__":
    main()
