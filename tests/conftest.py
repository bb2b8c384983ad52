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


@pytest.fixture(scope="session")
def scenes_dir():
    return SCENES
