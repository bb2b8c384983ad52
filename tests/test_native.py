"""Native C++ BVH builder: availability, bit-parity with numpy, speed."""

import time

import numpy as np
import pytest

from pathtracer_cuda_interactive_tpu.models import native
from pathtracer_cuda_interactive_tpu.models.bvh import build_bvh, validate_bvh


def _random_boxes(P, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-10, 10, (P, 3)).astype(np.float32)
    half = rng.uniform(0.01, 0.5, (P, 3)).astype(np.float32)
    return centers - half, centers + half


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib unavailable")


@needs_native
@pytest.mark.parametrize("P", [2, 3, 7, 100, 4096, 50001])
def test_native_matches_numpy_bitwise(P):
    pmin, pmax = _random_boxes(P, seed=P)
    a = build_bvh(pmin, pmax, use_native=False)
    b = build_bvh(pmin, pmax, use_native=True)
    np.testing.assert_array_equal(a.skip, b.skip)
    np.testing.assert_array_equal(a.prim, b.prim)
    np.testing.assert_array_equal(a.node_min, b.node_min)
    np.testing.assert_array_equal(a.node_max, b.node_max)
    assert a.depth == b.depth


@needs_native
def test_native_validates():
    pmin, pmax = _random_boxes(20000, seed=1)
    bvh = build_bvh(pmin, pmax, use_native=True)
    validate_bvh(bvh, pmin, pmax)


@needs_native
def test_native_is_faster_at_scale():
    pmin, pmax = _random_boxes(400000, seed=2)
    t0 = time.perf_counter()
    build_bvh(pmin, pmax, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_bvh(pmin, pmax, use_native=False)
    t_numpy = time.perf_counter() - t0
    # the C++ builder must at least keep pace; in practice it is ~2-10x
    # faster than the numpy level-sweep at this scale
    assert t_native < t_numpy * 1.5, (t_native, t_numpy)
