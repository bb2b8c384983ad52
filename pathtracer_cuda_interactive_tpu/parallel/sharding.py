"""Multi-chip rendering: tile + sample sharding over a device mesh.

The reference is single-process single-GPU with zero inter-device
communication (SURVEY.md §2 "Parallelism strategies"); its one parallelism
axis is the CUDA thread grid over pixels (main.cu:220-227).  The TPU-native
scaling design replaces that with a 2-axis ``jax.sharding.Mesh``:

  * ``tiles``   — pixel-row slabs sharded across chips (the data-parallel
                  axis; each chip renders its own rows, no communication).
  * ``samples`` — the per-pixel sample batch split across chips; partial
                  radiance sums are reduced with one ``psum`` over ICI.

Scene buffers (BVH, vertex pools, material tables) are *replicated* on
every chip — the analog of the reference keeping its whole scene resident
on the one GPU (scene.h:73-142).  The only collective in the forward path
is the sample-axis ``psum``; gradients of scene parameters in the
differentiable path additionally ``psum`` over both axes
(grad/inverse.py).  Multi-host runs ride the same code: call
``jax.distributed.initialize()`` first and pass the global mesh.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.device_scene import DeviceScene
from ..ops.integrator import LANES, MAX_DEPTH, render_pixel_sums

TILE_AXIS = "tiles"
SAMPLE_AXIS = "samples"


def make_mesh(devices=None, sample_parallel: int = 1) -> Mesh:
    """Build the (samples, tiles) mesh.  ``sample_parallel`` chips share
    each pixel slab and split the sample batch; the rest shard tiles.
    Defaults to all visible devices, pure tile sharding."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % sample_parallel:
        raise ValueError(f"{n} devices not divisible by "
                         f"sample_parallel={sample_parallel}")
    arr = np.asarray(devices).reshape(sample_parallel, n // sample_parallel)
    return Mesh(arr, (SAMPLE_AXIS, TILE_AXIS))


def replicate_scene(scene: DeviceScene, mesh: Mesh) -> DeviceScene:
    """Place every scene leaf on all mesh devices, fully replicated — the
    device_put that plays the role of GPUScene::copyFrom (scene.h:73-142)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(scene, sharding)


def _padded_grid(width: int, height: int, n_tiles: int):
    """Flat pixel grid [rows, LANES] padded so rows divide n_tiles."""
    R = width * height
    rows = -(-R // LANES)
    rows = -(-rows // n_tiles) * n_tiles
    pix = np.arange(rows * LANES, dtype=np.uint32).reshape(rows, LANES)
    return pix, rows


@partial(jax.jit,
         static_argnames=("width", "height", "num_samples", "seed",
                          "max_depth", "mesh"))
def _render_sharded(scene, cam_data, pix, sample_start, width, height,
                    num_samples, seed, max_depth, mesh):
    ns_total = num_samples
    ns_shard = mesh.shape[SAMPLE_AXIS]
    ns_local = -(-ns_total // ns_shard)  # static ceil per shard

    def shard_fn(scene, cam_data, pix, sample_start):
        s_idx = lax.axis_index(SAMPLE_AXIS)
        local_start = sample_start + (s_idx * ns_local).astype(jnp.uint32)
        # every shard runs the same static ns_local passes, but passes past
        # the global num_samples are masked to zero, so the psum'd result
        # covers EXACTLY num_samples (a caller dividing by num_samples is
        # always correct)
        n_real = jnp.clip(ns_total - s_idx * ns_local, 0, ns_local)
        acc = render_pixel_sums(scene, cam_data, pix, width, height,
                                local_start, ns_local, seed, max_depth,
                                num_real=n_real)
        return lax.psum(acc, SAMPLE_AXIS)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(TILE_AXIS, None), P()),
        out_specs=P(TILE_AXIS, None, None),
        check_vma=False)
    return fn(scene, cam_data, pix, sample_start)


def render_samples_sharded(scene: DeviceScene, cam_data, width: int,
                           height: int, sample_start, num_samples: int,
                           mesh: Mesh, seed: int = 1984,
                           max_depth: int = MAX_DEPTH) -> jnp.ndarray:
    """Sharded equivalent of ops.integrator.render_samples: returns the
    [H, W, 3] radiance sum of EXACTLY ``num_samples`` passes, computed
    across the mesh (per-chip pass counts ceil-round, but the surplus
    passes are masked out of the sum)."""
    n_tiles = mesh.shape[TILE_AXIS]
    pix, rows = _padded_grid(width, height, n_tiles)
    pix_sharded = jax.device_put(
        jnp.asarray(pix), NamedSharding(mesh, P(TILE_AXIS, None)))
    acc = _render_sharded(scene, cam_data, pix_sharded,
                          jnp.asarray(sample_start, jnp.uint32),
                          width, height, num_samples, seed, max_depth, mesh)
    acc = acc.reshape(rows * LANES, 3)[:width * height]
    return acc.reshape(height, width, 3)


def effective_samples(num_samples: int, mesh: Mesh) -> int:
    """Samples in the sum render_samples_sharded returns.  Since surplus
    ceil-rounded passes are masked, this is now always ``num_samples``;
    kept for API compatibility."""
    del mesh
    return num_samples


def scaling_report(width: int = 640, height: int = 480,
                   num_samples: int = 8, scene=None, cam_data=None,
                   repeats: int = 3) -> dict:
    """Measure rays/s on 1 device vs the full mesh (SURVEY.md §6 scaling
    efficiency target ≥80%).  Returns {n_devices, speedup, efficiency}."""
    import time

    def run(mesh):
        out = render_samples_sharded(scene, cam_data, width, height,
                                     jnp.uint32(0), num_samples, mesh)
        out.block_until_ready()
        t0 = time.perf_counter()
        for k in range(repeats):
            out = render_samples_sharded(scene, cam_data, width, height,
                                         jnp.uint32(k + 1), num_samples,
                                         mesh)
        out.block_until_ready()
        return repeats / (time.perf_counter() - t0)

    devs = jax.devices()
    f1 = run(make_mesh(devs[:1]))
    fN = run(make_mesh(devs))
    n = len(devs)
    return {"n_devices": n, "speedup": fN / f1,
            "efficiency": fN / f1 / n}
