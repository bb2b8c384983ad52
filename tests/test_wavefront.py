"""Sorted-wavefront tracer parity vs the oracle XLA path."""

import numpy as np
import pytest

import jax.numpy as jnp

from pathtracer_cuda_interactive_tpu.models.bricks import BrickSet
from pathtracer_cuda_interactive_tpu.models.device_scene import DeviceScene
from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
from pathtracer_cuda_interactive_tpu.ops import integrator, wavefront
from pathtracer_cuda_interactive_tpu.ops.camera import Camera, camera_ray_data

W, H = 96, 64


@pytest.fixture(scope="module")
def teapot(scenes_dir):
    pack, parsed = load_scene(f"{scenes_dir}/teapot/teapot_constant.xml")
    return pack, parsed


@pytest.mark.parametrize("sort_mode", ["mort_oct", "none"])
def test_wavefront_matches_xla_shallow(teapot, sort_mode):
    """Same RNG streams as the oracle -> images agree except tie-break
    pixels on shared triangle edges (traversal-order dependent)."""
    pack, parsed = teapot
    ds = DeviceScene.from_pack(pack)
    bs = BrickSet.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    spp, depth = 1, 3
    ref = np.asarray(integrator.render_samples(
        ds, cd, W, H, 0, spp, max_depth=depth))
    got = np.asarray(wavefront.render_samples_wavefront(
        bs, cd, W, H, 0, spp, max_depth=depth, interpret=True,
        sort_mode=sort_mode))
    bad = ~np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert bad.mean() < 1e-3, f"{bad.mean():%} mismatched"
    assert np.abs(ref - got).mean() < 1e-3


def test_wavefront_slim2_matches_xla(teapot):
    """DMA-pipelined walk (trace='slim2') == oracle: the two-slot
    pipeline's stale-by-one best-t may only admit extra work, never
    change the closest hit."""
    pack, parsed = teapot
    ds = DeviceScene.from_pack(pack)
    bs = BrickSet.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    ref = np.asarray(integrator.render_samples(
        ds, cd, W, H, 0, 1, max_depth=3))
    got = np.asarray(wavefront.render_samples_wavefront(
        bs, cd, W, H, 0, 1, max_depth=3, interpret=True, trace="slim2"))
    bad = ~np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert bad.mean() < 1e-3


def test_wavefront_with_spheres_deep(scenes_dir):
    """Resident sphere table + multi-chunk sample batch + RR depth."""
    pack, parsed = load_scene(f"{scenes_dir}/aabb_test/aabb_test.xml")
    ds = DeviceScene.from_pack(pack)
    bs = BrickSet.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    ref = np.asarray(integrator.render_samples(
        ds, cd, W, H, 0, 1, max_depth=3))
    got = np.asarray(wavefront.render_samples_wavefront(
        bs, cd, W, H, 0, 1, max_depth=3, interpret=True))
    bad = ~np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert bad.mean() < 1e-3


def test_wavefront_sample_sum_and_reproducible(teapot):
    """sum over sample_start splits == one batched call; bit-reproducible."""
    pack, parsed = teapot
    bs = BrickSet.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera),
                                     48, 32))
    a = np.asarray(wavefront.render_samples_wavefront(
        bs, cd, 48, 32, 0, 2, max_depth=2, interpret=True))
    b0 = np.asarray(wavefront.render_samples_wavefront(
        bs, cd, 48, 32, 0, 1, max_depth=2, interpret=True))
    b1 = np.asarray(wavefront.render_samples_wavefront(
        bs, cd, 48, 32, 1, 1, max_depth=2, interpret=True))
    assert np.allclose(a, b0 + b1, rtol=1e-5, atol=1e-6)
    a2 = np.asarray(wavefront.render_samples_wavefront(
        bs, cd, 48, 32, 0, 2, max_depth=2, interpret=True))
    assert np.array_equal(a, a2)
