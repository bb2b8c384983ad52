"""Microbenchmark: per-bounce wavefront overheads on the real TPU.

Measures the XLA-side costs the sorted-wavefront brick tracer will pay per
bounce: u32 argsort of N ray keys, permutation-gather of the ray SoA, a
scatter-add of N radiance values into pixels, and a while_loop step with
those inside.  Run under axon (real chip)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 640 * 480 * 2  # bunny interactive config: 614,400 rays
FIELDS = 14        # org3 dir3 T3 L3 state pix


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
    fields = [jax.random.normal(jax.random.PRNGKey(i), (N,), jnp.float32)
              for i in range(FIELDS)]
    pix = jax.random.randint(key, (N,), 0, 640 * 480, dtype=jnp.int32)
    vals = fields[0]

    argsort = jax.jit(lambda k: jnp.argsort(k))
    t = timeit(argsort, keys)
    print(f"argsort[{N}] i32: {t*1e3:.3f} ms")

    perm = argsort(keys)

    @jax.jit
    def take_all(perm, *fs):
        return tuple(f[perm] for f in fs)
    t = timeit(take_all, perm, *fields)
    print(f"take x{FIELDS} [{N}] f32: {t*1e3:.3f} ms")

    @jax.jit
    def sort_pairs(k, *fs):
        # single fused sort of key + payload columns
        out = jax.lax.sort((k,) + fs, num_keys=1)
        return out
    t = timeit(sort_pairs, keys, *fields)
    print(f"lax.sort key+{FIELDS} payloads: {t*1e3:.3f} ms")

    @jax.jit
    def scat(pix, v):
        return jnp.zeros(640 * 480, jnp.float32).at[pix].add(v)
    t = timeit(scat, pix, vals)
    print(f"scatter-add [{N}]->[{640*480}]: {t*1e3:.3f} ms")

    @jax.jit
    def seg(pix, v):
        return jax.ops.segment_sum(v, pix, num_segments=640 * 480)
    t = timeit(seg, pix, vals)
    print(f"segment_sum: {t*1e3:.3f} ms")

    # while_loop with sort+takes inside (8 iterations)
    @jax.jit
    def loop(keys, *fs):
        def body(st):
            i, k, fs = st
            p = jnp.argsort(k)
            fs = tuple(f[p] for f in fs)
            k = k[p] ^ (i + 1)
            return i + 1, k, fs
        def cond(st):
            return st[0] < 8
        return jax.lax.while_loop(cond, body, (0, keys, tuple(fs)))
    t = timeit(loop, keys, *fields, reps=5)
    print(f"while_loop 8x(argsort+take x{FIELDS}): {t*1e3:.3f} ms "
          f"({t*1e3/8:.3f} ms/iter)")


if __name__ == "__main__":
    main()
