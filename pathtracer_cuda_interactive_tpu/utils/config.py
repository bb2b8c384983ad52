"""Runtime configuration.

The reference scatters its knobs across compile-time constants
(SURVEY.md §5 "Config/flag system": MAX_DEPTH 50 radiance.cuh:12, RR start
depth 5 radiance.cuh:68, camera epsilon 1e-5 main.cu:298, default 2
samples/frame main.cu:131, RNG seed 1984 main.cu:61, UI ranges
imgui_manager.cpp:101-105).  Here they live in one dataclass.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class RenderConfig:
    max_depth: int = 50            # radiance.cuh:12
    rr_start_depth: int = 5        # radiance.cuh:68
    camera_epsilon: float = 1e-5   # main.cu:298
    samples_per_frame: int = 2     # main.cu:131
    seed: int = 1984               # main.cu:61
    fov_min: float = 10.0          # imgui_manager.cpp:101
    fov_max: float = 120.0
    spf_min: int = 1               # imgui_manager.cpp:105
    spf_max: int = 10
    move_speed: float = 0.5        # imgui_manager.cpp WASD speed (:143)
    mouse_sensitivity: float = 0.1  # imgui_manager.cpp orbit (:254)
    # block on the device each frame (cudaDeviceSynchronize analog,
    # main.cu:336).  False lets frames pipeline — for throughput paths
    # where a host round-trip per frame measures link latency, not chip.
    sync_each_frame: bool = True
    # next-event estimation for point lights — a beyond-reference
    # capability (the reference parses point lights but never samples
    # them, SURVEY.md §3.5).  Implemented natively on the xla, megakernel,
    # wavefront and mx paths; only the persistent brick kernel lacks a
    # hook, so "bricks" reroutes to "wavefront" when NEE is on
    # (render/renderer.py).
    enable_nee: bool = False
    # large-triangle-scene compute path: "wavefront" (bounce-synchronous
    # sorted re-packetization, ops/wavefront.py — the default, and the
    # measured winner on real TPU every round).  The retired experiments
    # ("mx2", "mx", "bricks" — see experiments/__init__.py) remain
    # reachable here by explicit opt-in only.
    large_scene_mode: str = "wavefront"
    # per-wave closest-hit engine of the wavefront path: "slim" (the
    # scalar-walk brick kernel — the measured winner on TPU every round,
    # PERFLOG.md r4/r5), "slim[N]" (same walk at N-row packets),
    # "slimg[N]" (N-row sub-packet chunk gating — measured slower on
    # bunny, r5), "slim2" (two-slot DMA pipeline), or "pairs[N]" (XLA
    # visit lists + flat Pallas pair grid, ops/pairtrace.py)
    wavefront_trace: str = "slim"
    # rows/N chunk size of the post-wave-1 compaction ladder
    # (ops/wavefront.py, PERFLOG r5: +19% on bunny); 0 disables
    wavefront_compact_tail: int = 8
    # tail bounce-loop engine override ("" = same as wavefront_trace)
    wavefront_tail_trace: str = ""


_CONFIGURED = False


def setup_jax(cache_dir: str | None = None) -> None:
    """Process-wide JAX tuning: enable the persistent compilation cache
    (first compiles of the integrator cost minutes on TPU; cached reloads
    are seconds)."""
    global _CONFIGURED
    if _CONFIGURED:
        return
    import jax
    cache_dir = cache_dir or os.environ.get(
        "PT_JAX_CACHE", os.path.expanduser("~/.cache/pathtracer_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass  # older jax without these flags
    _CONFIGURED = True
