"""Pair-list flat-grid tracer: unit tests for the XLA visit-list builder
and parity of the full render vs both the slim-walk kernel and the XLA
oracle (ops/pairtrace.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pathtracer_cuda_interactive_tpu.models.bricks import BrickSet
from pathtracer_cuda_interactive_tpu.models.device_scene import DeviceScene
from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
from pathtracer_cuda_interactive_tpu.ops import integrator, wavefront
from pathtracer_cuda_interactive_tpu.ops.camera import Camera, camera_ray_data
from pathtracer_cuda_interactive_tpu.ops.pairtrace import (
    PACKET_ROWS, _pack_pairs, trace_wave_pairs)

W, H = 96, 64


@pytest.fixture(scope="module")
def teapot(scenes_dir):
    return load_scene(f"{scenes_dir}/teapot/teapot_constant.xml")


def test_pack_pairs_packet_major_near_first():
    """Valid pairs sort packet-major then by entry bound; invalids sink."""
    inf = np.inf
    lb = jnp.asarray(np.array([
        [3.0, inf, 1.0],     # packet 0 visits bricks 2 (near) then 0
        [inf, inf, inf],     # packet 1 visits nothing
        [0.5, 2.0, 1.0],     # packet 2 visits 0, 2, 1
    ], np.float32))
    pkt, brk, ent, count = _pack_pairs(lb)
    assert int(count) == 5
    assert pkt[:5].tolist() == [0, 0, 2, 2, 2]
    assert brk[:5].tolist() == [2, 0, 0, 2, 1]
    assert ent[:5].tolist() == [1.0, 3.0, 0.5, 1.0, 2.0]
    assert np.all(np.asarray(pkt[5:]) == 3)          # sentinel = P


def test_trace_wave_pairs_matches_slim(teapot):
    """(t, slot) of the pair tracer == the slim-walk kernel on identical
    waves (same closest-hit query; ties on shared edges may differ, so
    compare t exactly and slots only where t is unique)."""
    pack, parsed = teapot
    bs = BrickSet.from_pack(pack)
    rows = PACKET_ROWS * 2
    rng = np.random.default_rng(7)
    lo, hi = bs.brick_lo.min(axis=0), bs.brick_hi.max(axis=0)
    ctr, ext = (lo + hi) / 2, (hi - lo)
    org = (ctr[:, None, None]
           + (rng.random((3, rows, 128)).astype(np.float32) - 0.5)
           * ext[:, None, None] * 2.5)
    dirn = rng.standard_normal((3, rows, 128)).astype(np.float32)
    dirn /= np.linalg.norm(dirn, axis=0, keepdims=True)
    act = (rng.random((rows, 128)) < 0.9).astype(np.float32)

    args = [jnp.asarray(a) for a in (*org, *dirn, act)]
    t_p, s_p = trace_wave_pairs(
        jnp.asarray(bs.brick_data), jnp.asarray(bs.brick_lo),
        jnp.asarray(bs.brick_hi), 0.0, *args, interpret=True)
    t_s, s_s = wavefront._trace_wave_slim(
        jnp.asarray(bs.sph_rows), jnp.asarray(bs.top_boxes),
        jnp.asarray(bs.top_links), jnp.asarray(bs.brick_data), 0.0,
        *args, bs.num_spheres, interpret=True)
    t_p, s_p, t_s, s_s = map(np.asarray, (t_p, s_p, t_s, s_s))
    # the slim walk reports t for DEAD lanes too (it clamps nothing);
    # pair lists cull empty packets, so compare live lanes only
    live = act > 0.0
    assert np.array_equal(t_p[live] == np.inf, t_s[live] == np.inf)
    both = live & (t_p < np.inf)
    assert np.allclose(t_p[both], t_s[both], rtol=1e-6, atol=1e-6)
    # slots may legitimately differ only on exact-tie hits
    diff = both & (s_p != s_s)
    assert diff.mean() < 1e-3


def test_pairs_render_matches_xla_deep(scenes_dir):
    """Full render through the pair tracer (spheres + triangles + RR) vs
    the oracle."""
    pack, parsed = load_scene(f"{scenes_dir}/aabb_test/aabb_test.xml")
    ds = DeviceScene.from_pack(pack)
    bs = BrickSet.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    ref = np.asarray(integrator.render_samples(ds, cd, W, H, 0, 1,
                                               max_depth=3))
    got = np.asarray(wavefront.render_samples_wavefront(
        bs, cd, W, H, 0, 1, max_depth=3, interpret=True, trace="pairs"))
    bad = ~np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert bad.mean() < 1e-3


def test_pairs_reproducible_and_sample_additive(teapot):
    pack, parsed = teapot
    bs = BrickSet.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera),
                                     48, 32))
    a = np.asarray(wavefront.render_samples_wavefront(
        bs, cd, 48, 32, 0, 2, max_depth=2, interpret=True, trace="pairs"))
    b0 = np.asarray(wavefront.render_samples_wavefront(
        bs, cd, 48, 32, 0, 1, max_depth=2, interpret=True, trace="pairs"))
    b1 = np.asarray(wavefront.render_samples_wavefront(
        bs, cd, 48, 32, 1, 1, max_depth=2, interpret=True, trace="pairs"))
    assert np.allclose(a, b0 + b1, rtol=1e-5, atol=1e-6)
    a2 = np.asarray(wavefront.render_samples_wavefront(
        bs, cd, 48, 32, 0, 2, max_depth=2, interpret=True, trace="pairs"))
    assert np.array_equal(a, a2)
