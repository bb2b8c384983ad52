"""Decompose the wavefront's per-wave XLA epilogue cost (r5).

probe_r5 measured shade ~47-53 ms per wave, dense over all 655k rays at
every depth.  Arithmetic says the elementwise work (RNG + BRDF + MT
re-solve, ~300 flops/ray) should cost well under 1 ms, so the suspect is
the winner-record gather (jnp.take of 32-float rows by 655k indices).
This isolates each piece on the real chip:

  g32:   take [411k,32] rows by 655k flat indices  (the shade gather)
  g128:  take [5120,128] rows by K row indices     (the binning gather)
  sort1: lax.sort of rows*B i32 keys               (pair extraction)
  elem:  _shade on a FAKE record (no gather)       (pure elementwise)
  rec:   _record_from_slots alone                  (gather + re-solve)

Usage: python tools/probe_shade.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathtracer_cuda_interactive_tpu.utils.config import setup_jax
setup_jax()

import jax
import jax.numpy as jnp

from pathtracer_cuda_interactive_tpu.ops import rng
from pathtracer_cuda_interactive_tpu.ops.vec import Vec3
from pathtracer_cuda_interactive_tpu.ops.wavefront import (_record_from_slots,
                                                           _shade)

ROWS, LANES = 5120, 128
NREC = 803 * 512
REPS = 8


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:28s} {dt:8.2f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    tri_rows = jax.random.uniform(key, (NREC, 32), jnp.float32)
    idx = jax.random.randint(key, (ROWS, LANES), 0, NREC, jnp.int32)
    rowidx = jax.random.randint(key, (ROWS * 4,), 0, ROWS, jnp.int32)
    big = jax.random.uniform(key, (ROWS, LANES), jnp.float32)

    g32 = jax.jit(lambda tr, ix: jnp.take(tr, ix.reshape(-1), axis=0)
                  .reshape(ROWS, LANES, 32).sum(axis=-1))
    timeit("g32 take [411k,32] x 655k", g32, tri_rows, idx)

    g128 = jax.jit(lambda b, ix: jnp.take(b, ix, axis=0))
    timeit("g128 take rows x 20k", g128, big, rowidx[:20480])

    keys = jax.random.randint(key, (ROWS * 803,), 0, 1 << 30, jnp.int32)
    sort1 = jax.jit(lambda k: jax.lax.sort(k))
    timeit("sort 4.1M i32 keys", sort1, keys)

    ix2 = jnp.argsort(keys)[:1 << 19]
    timeit("argsort 4.1M + take 512k", jax.jit(
        lambda k: jnp.sort(k)[:1 << 19]), keys)

    shape = (ROWS, LANES)
    org = Vec3(big, big + 1.0, big + 2.0)
    dirn = Vec3(big * 0.5, big * 0.3, big + 0.1)
    T = Vec3.full(shape, (1.0, 1.0, 1.0))
    L = Vec3.zeros(shape)
    active = big > 0.2
    state = rng.seed_rays(idx.astype(jnp.uint32),
                          jnp.zeros(shape, jnp.uint32), 1)
    bg3 = Vec3(jnp.float32(0.5), jnp.float32(0.5), jnp.float32(0.5))

    t = jnp.where(big > 0.5, big * 10.0, jnp.inf)
    slot = jnp.where(big > 0.5, idx, -1)

    fake_rec = (t, big, big, big, big, big, big, jnp.zeros(shape),
                big, big, big, big, big, big, big, jnp.zeros(shape))

    elem = jax.jit(lambda rec, o, d, T, L, a, s: _shade(
        rec, o, d, T, L, a, s, jnp.int32(1), bg3, 5, 50))
    timeit("shade elementwise (no rec)", elem, fake_rec, org, dirn, T, L,
           active, state)

    sph_rows = jnp.zeros((1, 32), jnp.float32)
    rec = jax.jit(lambda tr, sp, t, sl, o, d, a: _record_from_slots(
        tr, sp, 0, t, sl, o, d, 1e-4, a))
    timeit("_record_from_slots", rec, tri_rows, sph_rows, t, slot, org,
           dirn, active)

    # the two fused (what the real wave pays)
    both = jax.jit(lambda tr, sp, t, sl, o, d, Tv, Lv, a, s: _shade(
        _record_from_slots(tr, sp, 0, t, sl, o, d, 1e-4, a),
        o, d, Tv, Lv, a, s, jnp.int32(1), bg3, 5, 50))
    timeit("record + shade fused", both, tri_rows, sph_rows, t, slot,
           org, dirn, T, L, active, state)


if __name__ == "__main__":
    main()
