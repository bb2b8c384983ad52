"""Per-packet traversal-cost counters for the wavefront trace kernel.

Reports nodes stepped / bricks DMA'd / chunks tested per packet for the
primary wave and for the sorted secondary wave on a real scene — the
numbers that decide where the kernel time goes (scalar walk vs DMA vs
VPU chunk tests).  Run on TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_cuda_interactive_tpu.utils.config import setup_jax
setup_jax()

from pathtracer_cuda_interactive_tpu.models.bricks import BrickSet
from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
from pathtracer_cuda_interactive_tpu.ops import rng, wavefront
from pathtracer_cuda_interactive_tpu.ops.camera import (Camera,
                                                        camera_ray_data,
                                                        generate_primary_rays)
from pathtracer_cuda_interactive_tpu.ops.wavefront import (LANES, WAVE_ROWS,
                                                           _sort_key,
                                                           _trace_wave,
                                                           _wave_layout)
from pathtracer_cuda_interactive_tpu.ops.vec import Vec3, normalize

SCENE = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/scenes/bunny/bunny.xml"
W = int(os.environ.get("KS_W", "640"))
H = int(os.environ.get("KS_H", "480"))
INTERPRET = os.environ.get("KS_INTERPRET", "0") == "1"


def report(tag, stats, n_blocks, dt):
    s = np.asarray(stats).reshape(n_blocks, WAVE_ROWS, LANES)
    nodes, bricks, chunks = s[:, 0, 0], s[:, 1, 0], s[:, 2, 0]
    print(f"{tag}: {dt*1e3:8.1f} ms  per-packet nodes "
          f"{nodes.mean():6.1f} (max {nodes.max():5.0f})  bricks "
          f"{bricks.mean():6.1f} (max {bricks.max():5.0f})  chunks "
          f"{chunks.mean():6.1f} (max {chunks.max():5.0f})", flush=True)


def run_wave(tag, bs, org, dirn, act, tnear):
    args = (bs.sph_rows, bs.top_boxes, bs.top_links, bs.brick_data, tnear,
            org.x, org.y, org.z, dirn.x, dirn.y, dirn.z, act)
    S = bs.num_spheres
    f = jax.jit(lambda *a: _trace_wave(*a, S, interpret=INTERPRET,
                                       collect_stats=True))
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    report(tag, out[16], org.x.shape[0] // WAVE_ROWS, dt)
    return out


def main():
    pack, parsed = load_scene(SCENE)
    bs = jax.device_put(BrickSet.from_pack(pack))
    print(f"{pack.num_triangles} tris -> {bs.num_bricks} bricks, "
          f"{bs.num_top} top nodes", flush=True)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    pix_slots, n_blocks = _wave_layout(W, H)
    pix = jnp.asarray(pix_slots).reshape(-1, LANES)
    shape = pix.shape
    state = rng.seed_rays(pix.astype(jnp.uint32), 0)
    state, u1 = rng.next_uniform(state)
    state, u2 = rng.next_uniform(state)
    i = (pix % W).astype(jnp.float32)
    j = (pix // W).astype(jnp.float32)
    org, dirn = generate_primary_rays(cd, (i + u1) / W, (j + u2) / H)
    act = jnp.ones(shape, jnp.float32)

    rec = run_wave("primary  ", bs, org, dirn, act, 0.0)

    # one diffuse bounce, then the sorted secondary wave
    t, nsx, nsy, nsz = rec[0], rec[1], rec[2], rec[3]
    px, py, pz = rec[4], rec[5], rec[6]
    hit = t < jnp.inf
    ns = normalize(Vec3(nsx, nsy, nsz))
    n = Vec3(jnp.where(ns.x * dirn.x + ns.y * dirn.y + ns.z * dirn.z > 0,
                       -ns.x, ns.x),
             jnp.where(ns.x * dirn.x + ns.y * dirn.y + ns.z * dirn.z > 0,
                       -ns.y, ns.y),
             jnp.where(ns.x * dirn.x + ns.y * dirn.y + ns.z * dirn.z > 0,
                       -ns.z, ns.z))
    state, v1 = rng.next_uniform(state)
    state, v2 = rng.next_uniform(state)
    st = jnp.sqrt(v1)
    phi = 2 * np.pi * v2
    a = Vec3(jnp.where(jnp.abs(n.x) > 0.9, 0.0, 1.0),
             jnp.where(jnp.abs(n.x) > 0.9, 1.0, 0.0),
             jnp.zeros_like(n.x))
    tx = normalize(Vec3(n.y * a.z - n.z * a.y, n.z * a.x - n.x * a.z,
                        n.x * a.y - n.y * a.x))
    ty = Vec3(n.y * tx.z - n.z * tx.y, n.z * tx.x - n.x * tx.z,
              n.x * tx.y - n.y * tx.x)
    cz = jnp.sqrt(jnp.maximum(1 - v1, 0.0))
    wo = Vec3(tx.x * jnp.cos(phi) * st + ty.x * jnp.sin(phi) * st + n.x * cz,
              tx.y * jnp.cos(phi) * st + ty.y * jnp.sin(phi) * st + n.y * cz,
              tx.z * jnp.cos(phi) * st + ty.z * jnp.sin(phi) * st + n.z * cz)
    org2 = Vec3(px, py, pz)
    act2 = jnp.where(hit, 1.0, 0.0)

    run_wave("sec/fixed", bs, org2, wo, act2, 1e-4)

    root = np.asarray(bs.top_boxes[0, :6], np.float32)
    lo, hi = root[:3], root[3:]
    inv = jnp.asarray(1.0 / np.maximum(hi - lo, 1e-12))
    key = _sort_key(org2, wo, act2 > 0, jnp.asarray(lo), inv)
    flat = lambda a: a.reshape(-1)
    cols = jax.lax.sort((flat(key), flat(org2.x), flat(org2.y),
                         flat(org2.z), flat(wo.x), flat(wo.y), flat(wo.z),
                         flat(act2)), num_keys=1)
    ox, oy, oz, dx, dy, dz, a2 = (c.reshape(shape) for c in cols[1:])
    run_wave("sec/sort ", bs, Vec3(ox, oy, oz), Vec3(dx, dy, dz), a2, 1e-4)


if __name__ == "__main__":
    main()
