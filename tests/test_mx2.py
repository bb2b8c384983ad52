"""Pallas MXU superbrick tracer (ops/mx2.py): builder invariants + image
parity vs the XLA oracle integrator (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pathtracer_cuda_interactive_tpu.models.device_scene import DeviceScene
from pathtracer_cuda_interactive_tpu.experiments.mx2set import (MX2Set, NUM_SUBS,
                                                           SB_PRIMS,
                                                           SUB_PRIMS,
                                                           build_mx2set)
from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
from pathtracer_cuda_interactive_tpu.ops import integrator
from pathtracer_cuda_interactive_tpu.ops.camera import Camera, camera_ray_data
from pathtracer_cuda_interactive_tpu.experiments.mx2 import render_samples_mx2


def test_builder_invariants(scenes_dir):
    """Every triangle lands in exactly one slot; sub-AABBs contain their
    triangles; coefficient slabs have the transposed layout."""
    pack, _ = load_scene(f"{scenes_dir}/teapot/teapot_constant.xml")
    mx = build_mx2set(pack)
    B = mx.num_bricks
    assert mx.coeff.shape == (B, NUM_SUBS * 16, 128)
    assert mx.subbox.shape == (B, 128)
    assert mx.tri_rows.shape == (B * SB_PRIMS, 32)
    # non-padding rows count equals the scene's triangle count
    real = (mx.tri_rows[:, 0] != 0).sum()
    assert real == pack.num_triangles
    # sub validity flags
    sub = mx.subbox.reshape(B, NUM_SUBS, 8)
    nvalid = int(sub[:, :, 6].sum())
    assert nvalid == -(-pack.num_triangles // SUB_PRIMS) or nvalid >= 1
    # valid subs have min <= max
    v = sub[:, :, 6] > 0
    assert (sub[v][:, 0:3] <= sub[v][:, 3:6] + 1e-6).all()


@pytest.mark.parametrize("xml", ["triangles/tetrahedron.xml",
                                 "teapot/teapot_constant.xml",
                                 "aabb_test/aabb_test.xml"])
def test_mx2_matches_xla_shallow(scenes_dir, xml):
    W, H = 64, 48
    pack, parsed = load_scene(f"{scenes_dir}/{xml}")
    ds = DeviceScene.from_pack(pack)
    mx = MX2Set.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    ref = np.asarray(integrator.render_samples(
        ds, cd, W, H, 0, 1, max_depth=3))
    got = np.asarray(render_samples_mx2(mx, cd, W, H, 0, 1, max_depth=3,
                                        interpret=True))
    bad = np.abs(ref - got) > 1e-3
    assert bad.mean() < 2e-3, f"{bad.mean():%} mismatched"
    assert np.abs(ref - got).mean() < 1e-3


def test_mx2_sample_sum_and_reproducible(scenes_dir):
    W, H = 48, 32
    pack, parsed = load_scene(f"{scenes_dir}/triangles/tetrahedron.xml")
    mx = MX2Set.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    a = np.asarray(render_samples_mx2(mx, cd, W, H, 0, 2, max_depth=4,
                                      interpret=True))
    b0 = np.asarray(render_samples_mx2(mx, cd, W, H, 0, 1, max_depth=4,
                                       interpret=True))
    b1 = np.asarray(render_samples_mx2(mx, cd, W, H, 1, 1, max_depth=4,
                                       interpret=True))
    assert np.allclose(a, b0 + b1, rtol=1e-4, atol=1e-5)
    a2 = np.asarray(render_samples_mx2(mx, cd, W, H, 0, 2, max_depth=4,
                                       interpret=True))
    assert np.array_equal(a, a2)


def test_mx2_nee_matches_xla(scenes_dir):
    """Point-light NEE parity on the mx2 path (bunny-style scene has point
    lights; use the tetrahedron + its lights if present, else skip)."""
    pack, parsed = load_scene(f"{scenes_dir}/teapot/teapot_constant.xml")
    if pack.light_pos.shape[0] == 0:
        pytest.skip("scene has no point lights")
    W, H = 48, 32
    ds = DeviceScene.from_pack(pack)
    mx = MX2Set.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    ref = np.asarray(integrator.render_samples(
        ds, cd, W, H, 0, 1, max_depth=2, nee=True))
    got = np.asarray(render_samples_mx2(mx, cd, W, H, 0, 1, max_depth=2,
                                        nee=True, interpret=True))
    assert np.abs(ref - got).mean() < 1.5e-3
