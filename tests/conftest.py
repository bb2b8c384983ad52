"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding logic is testable without a TPU pod (SURVEY.md §4e)."""

import os

# The axon sitecustomize imports jax at interpreter startup and pins the
# platform, so env vars alone are too late here; XLA_FLAGS still applies
# because the CPU client is created lazily, and jax.config.update overrides
# the pinned platform.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def _enable_compile_cache():
    import jax
    cache = os.path.expanduser("~/.cache/pathtracer_tpu_jax_tests")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass


_enable_compile_cache()

SCENES = "/root/reference/scenes"

# Fast/slow split (VERDICT r4 weak #6): the full suite costs ~8.5 min on
# 2 cores; `-m fast` must stay under 2 min.  Tests matching these name
# prefixes measured >=4 s each (pytest --durations, r5) — recorded
# goldens, deep statistical parity, the retired mx/mx2 experiments, the
# 1.1M-tri big-scene build and the sharded end-to-end renders.  Marked
# centrally here so the split tracks measurements, not file layout.
_SLOW_PREFIXES = (
    "test_recorded_golden",
    "test_golden_image[bunny",
    "test_bunny_megascale_brickset",
    "test_sharded_bricks_matches_single",
    "test_sharded_mx",
    "test_sharded_wavefront_matches_single",
    "test_sharded_grad_matches_single",
    "test_mx2_",
    "test_mx_matches_xla_shallow",
    "test_mx_sample_sum",
    "test_brick_tracer_matches_xla_shallow",
    "test_pairs_render_matches_xla_deep",
    "test_pairs_reproducible_and_sample_additive",
    "test_wavefront_sample_sum_and_reproducible",
    "test_wavefront_with_spheres_deep",
    "test_wavefront_slim2_matches_xla",
    "test_grad_matches_finite_difference",
    "test_nee_wavefront_matches_xla",
    "test_nee_megakernel_matches_xla",
    "test_native_sah_is_faster_at_scale",
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >=4 s on the 2-core CPU mesh (goldens, deep "
        "parity, big scenes); deselect with -m fast")
    config.addinivalue_line(
        "markers", "fast: auto-applied complement of slow — "
        "`pytest -m fast` runs the quick suite (<2 min)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.startswith(_SLOW_PREFIXES):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def scenes_dir():
    return SCENES
