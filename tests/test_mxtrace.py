"""MXU (Plucker matmul) tracer: coefficient math + image parity vs the XLA
oracle integrator."""

import numpy as np
import pytest

import jax.numpy as jnp

from pathtracer_cuda_interactive_tpu.models.device_scene import DeviceScene
from pathtracer_cuda_interactive_tpu.experiments.mxset import MXSet, _tri_coeff
from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
from pathtracer_cuda_interactive_tpu.ops import integrator
from pathtracer_cuda_interactive_tpu.ops.camera import Camera, camera_ray_data
from pathtracer_cuda_interactive_tpu.experiments.mxtrace import render_samples_mx


def test_plucker_coeff_matches_moller_trumbore():
    """F . C reproduces (det, u*det, v*det, t*det) of intersect_triangle
    for random rays and triangles."""
    from pathtracer_cuda_interactive_tpu.ops.geometry import (
        intersect_triangle)
    from pathtracer_cuda_interactive_tpu.ops.vec import Vec3

    r = np.random.default_rng(7)
    T = 64
    p0 = r.normal(size=(T, 3))
    e1 = r.normal(size=(T, 3))
    e2 = r.normal(size=(T, 3))
    o = r.normal(size=(T, 3)) * 2.0
    d = r.normal(size=(T, 3))

    C = _tri_coeff(p0, e1, e2)                       # [T, 10, 4]
    F = np.concatenate([o, d, np.cross(o, d), np.ones((T, 1))], axis=1)
    got = np.einsum("tk,tkq->tq", F.astype(np.float32), C)  # [T, 4]
    det, U, V, Tt = got.T

    arr = lambda a: jnp.asarray(a[:, None], jnp.float32)
    v3 = lambda a: Vec3(arr(a[:, 0]), arr(a[:, 1]), arr(a[:, 2]))
    t, u, v, hit = intersect_triangle(v3(p0), v3(e1), v3(e2), v3(o), v3(d),
                                      -np.inf, np.inf)
    t = np.asarray(t)[:, 0]
    u = np.asarray(u)[:, 0]
    v = np.asarray(v)[:, 0]
    ok = np.abs(det) > 1e-3
    np.testing.assert_allclose(U[ok] / det[ok], u[ok], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(V[ok] / det[ok], v[ok], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(Tt[ok] / det[ok], t[ok], rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("xml", ["triangles/tetrahedron.xml",
                                 "teapot/teapot_constant.xml",
                                 "aabb_test/aabb_test.xml"])
def test_mx_matches_xla_shallow(scenes_dir, xml):
    W, H = 64, 48
    pack, parsed = load_scene(f"{scenes_dir}/{xml}")
    ds = DeviceScene.from_pack(pack)
    mx = MXSet.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    ref = np.asarray(integrator.render_samples(
        ds, cd, W, H, 0, 1, max_depth=3))
    got = np.asarray(render_samples_mx(mx, cd, W, H, 0, 1, max_depth=3))
    bad = np.abs(ref - got) > 1e-3
    assert bad.mean() < 2e-3, f"{bad.mean():%} mismatched"
    assert np.abs(ref - got).mean() < 1e-3


def test_mx_sample_sum_and_reproducible(scenes_dir):
    W, H = 48, 32
    pack, parsed = load_scene(f"{scenes_dir}/triangles/tetrahedron.xml")
    mx = MXSet.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    a = np.asarray(render_samples_mx(mx, cd, W, H, 0, 2, max_depth=4))
    b0 = np.asarray(render_samples_mx(mx, cd, W, H, 0, 1, max_depth=4))
    b1 = np.asarray(render_samples_mx(mx, cd, W, H, 1, 1, max_depth=4))
    assert np.allclose(a, b0 + b1, rtol=1e-4, atol=1e-5)
    a2 = np.asarray(render_samples_mx(mx, cd, W, H, 0, 2, max_depth=4))
    assert np.array_equal(a, a2)
