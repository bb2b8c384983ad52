"""Headline benchmark: progressive rendering throughput vs the reference.

Primary metric mirrors the reference's headline interactive config
(README.md:113): cbox at 640x480, progressive accumulation, 2
samples/pixel/frame.  The reference's RTX 3080 does 55-65 FPS there,
i.e. ~36.9 Msamples/s at the 60-FPS midpoint — that is the
``vs_baseline`` denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
``extra`` carries the driver-visible secondary metrics VERDICT r1/r2 asked
for:
  * per-frame *synced* cbox latency (the reference measures FPS with a
    cudaDeviceSynchronize every frame, main.cu:336);
  * Mrays/s for cbox and bunny (BASELINE.md's north star is rays/s):
    Mrays/s = Msamples/s x avg path length, with the path length counted
    by integrator.measure_path_stats (a scene+integrator property,
    identical across compute paths);
  * bunny (288k tris) full-depth throughput for BOTH large-scene paths
    (sorted wavefront vs the Pallas MXU superbrick tracer) with the
    measured winner as ``bunny_mode``;
  * a >=1M-triangle row (subdivided bunny = the stripped-buddha
    surrogate) through the winning path.

All timings sync through a real device->host readback (the dependency
chain acc = acc + frame forces every dispatched frame to execute before
the final np.asarray) — ``block_until_ready`` returns early on the
tunneled TPU platform and must not be trusted (tools/probe_hw.py).
"""

from __future__ import annotations

import json
import sys
import time

CBOX = "/root/reference/scenes/cbox/cbox.xml"
BUNNY = "/root/reference/scenes/bunny/bunny.xml"
W, H, SPF = 640, 480, 2
BASE_CBOX = 0.060 * W * H * SPF / 1e3    # Msamples/s at 60 FPS midpoint
BASE_BUNNY = 0.0475 * W * H * SPF / 1e3  # Msamples/s at 47.5 FPS midpoint
BASE_BUDDHA = 0.040 * W * H * SPF / 1e3  # Msamples/s at 40 FPS (README:130)
BENCH_T0 = time.perf_counter()
TIME_BUDGET_S = 520          # stay under the driver's timeout no matter what


def _throughput(r, frames: int, passes: int = 5) -> float:
    """Best-of-N pipelined throughput in Msamples/s.  Frames are dispatched
    without a per-frame host sync; the timed region ends with a real
    device->host readback of the accumulation buffer, so all frames must
    have fully executed on the TPU inside dt.  Passes are SPACED (2 s
    sleeps): tunnel-weather stalls last longer than one pass, and
    back-to-back passes can all land in the same bad window (the
    four-round cbox 'decline' was exactly that — PERFLOG r4)."""
    import numpy as np

    best_dt = float("inf")
    for k in range(passes):     # best-of-N: the tunnel adds rare stalls
        if k:
            time.sleep(2.0)
        t0 = time.perf_counter()
        for _ in range(frames):
            r.step(SPF, sync=False)
        checksum = float(np.asarray(r.accum).sum())
        dt = time.perf_counter() - t0
        assert checksum > 0
        best_dt = min(best_dt, dt)
    return frames * SPF * W * H / best_dt / 1e6


def _synced_latency_ms(r, frames: int = 10) -> float:
    """Median per-frame latency WITH a device-completion wait each frame —
    the analog of the reference's per-frame cudaDeviceSynchronize
    (main.cu:336).  The wait is a 4-byte dependent readback (one corner
    texel of the new accumulation buffer): it cannot complete before the
    whole frame has executed, but does not bill the 3.7 MB image download
    to the frame time the way a full np.asarray would — the reference's
    sync does not download the framebuffer either (its display reads
    managed memory separately, opengl_display.cpp:99-117)."""
    import numpy as np

    times = []
    for _ in range(frames):
        t0 = time.perf_counter()
        r.step(SPF, sync=False)
        float(np.asarray(r.accum[:1, :1, :1]))  # block_* lies; this cannot
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3


def _avg_path_length(xml: str, w: int = 160, h: int = 120,
                     spp: int = 2) -> float:
    """Average rays per camera sample, counted by the XLA oracle at a
    reduced resolution (path length is a property of scene + integrator
    semantics, radiance.cuh:24-77, not of the compute path)."""
    import jax.numpy as jnp

    from pathtracer_cuda_interactive_tpu.models.device_scene import (
        DeviceScene)
    from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
    from pathtracer_cuda_interactive_tpu.ops import integrator
    from pathtracer_cuda_interactive_tpu.ops.camera import (Camera,
                                                            camera_ray_data)
    pack, parsed = load_scene(xml)
    ds = DeviceScene.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera),
                                     w, h))
    rays, samples = integrator.measure_path_stats(ds, cd, w, h, 0, spp)
    return float(rays) / float(samples)


def main() -> int:
    from pathtracer_cuda_interactive_tpu.render.renderer import (
        ProgressiveRenderer)

    import numpy as np

    r = ProgressiveRenderer.from_xml(CBOX, width=W, height=H)
    for _ in range(3):          # warmup: compile + first D2H
        r.step(SPF)
    np.asarray(r.accum).sum()

    cbox_ms = _throughput(r, frames=30)
    cbox_lat = _synced_latency_ms(r)

    # the environment's own per-dispatch floor: a TRIVIAL donated add,
    # timed with the same 4-byte dependent readback the renderer syncs on.
    # Everything of cbox_synced_latency_ms above this line is chip time;
    # the floor itself is tunnel round-trip, not renderer cost (measured
    # 28.7 ms median on the axon tunnel, r4 — the reference's 55-65 FPS
    # per-frame sync would be impossible on this link for ANY renderer).
    import jax
    import jax.numpy as jnp
    x = jnp.zeros((H, W, 3), jnp.float32)
    triv = jax.jit(lambda a: a + 1.0, donate_argnums=0)
    x = triv(x)
    np.asarray(x[:1, :1, :1])
    floors = []
    for _ in range(15):
        t0 = time.perf_counter()
        x = triv(x)
        np.asarray(x[:1, :1, :1])
        floors.append(time.perf_counter() - t0)
    import numpy as _np
    floor_ms = float(_np.median(floors)) * 1e3

    chip_ms = cbox_lat - floor_ms
    chip_msps = SPF * W * H / chip_ms / 1e3
    extra = {"cbox_synced_latency_ms": round(cbox_lat, 2),
             "cbox_synced_fps": round(1e3 / cbox_lat, 1),
             "dispatch_sync_floor_ms": round(floor_ms, 2),
             "cbox_synced_chip_ms": round(chip_ms, 2),
             # floor-corrected CHIP-SIDE throughput: frame time with the
             # measured tunnel round trip subtracted — the number
             # comparable to the reference's locally-synced FPS
             # (VERDICT r4 ask #4; the raw `value` keeps the link's
             # session weather, this one does not)
             "cbox_chip_side_msamples_s": round(chip_msps, 2),
             "cbox_chip_side_vs_baseline": round(chip_msps / BASE_CBOX, 3)}

    # batched dispatch: 16 spp per launch through the same kernel (the
    # integrator's in-kernel sample fori_loop with identical RNG streams)
    # — measures chip throughput with the ~8-15 ms tunnel dispatch floor
    # amortized, the config a throughput consumer (offline/tile renders)
    # actually uses
    try:
        import numpy as np
        r.step(16, sync=False)
        np.asarray(r.accum).sum()   # compile + warm
        t0 = time.perf_counter()
        for _ in range(4):
            r.step(16, sync=False)
        np.asarray(r.accum).sum()
        dt = time.perf_counter() - t0
        extra["cbox_batched16_msamples_s"] = round(
            4 * 16 * W * H / dt / 1e6, 2)
    except Exception as e:      # pragma: no cover
        extra["cbox_batched_error"] = f"{type(e).__name__}: {e}"[:160]
    try:
        plc = _avg_path_length(CBOX)
        extra["cbox_avg_path_len"] = round(plc, 3)
        extra["cbox_mrays_s"] = round(cbox_ms * plc, 1)
    except Exception as e:      # pragma: no cover
        extra["cbox_mrays_error"] = f"{type(e).__name__}: {e}"[:160]

    # ---- bunny + buddha-surrogate: the shipping large-scene path (sorted
    # wavefront, slim walk + sig_mort sort — the r4 measured winner; the
    # retired mx/mx2 experiments live in experiments/ and are not benched).
    # Each stage runs OUT OF PROCESS with a hard wall-clock cap: a
    # cold-cache wavefront compile costs 3-8 min depending on tunnel
    # weather, and an overrunning stage must cost bench.py its stage,
    # never the JSON line (tools/bench_large_stage.py).
    import subprocess

    for stage in ("bunny", "buddha"):
        left = TIME_BUDGET_S - (time.perf_counter() - BENCH_T0)
        if left < 120:
            extra[f"{stage}_skipped"] = "time budget exhausted"
            continue
        try:
            proc = subprocess.run(
                [sys.executable, "-u",
                 "/root/repo/tools/bench_large_stage.py", stage],
                capture_output=True, text=True, timeout=left - 30)
            line = [ln for ln in proc.stdout.strip().splitlines()
                    if ln.startswith("{")]
            if proc.returncode == 0 and line:
                extra.update(json.loads(line[-1]))
            else:
                tail = (proc.stderr or proc.stdout or "").strip()[-140:]
                extra[f"{stage}_error"] = f"rc={proc.returncode}: {tail}"
        except subprocess.TimeoutExpired:
            extra[f"{stage}_error"] = "stage hit its wall-clock cap " \
                "(cold-cache compile in bad tunnel weather)"
        except Exception as e:  # pragma: no cover
            extra[f"{stage}_error"] = f"{type(e).__name__}: {e}"[:160]

    print(json.dumps({
        "metric": "cbox_progressive_throughput",
        "value": round(cbox_ms, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(cbox_ms / BASE_CBOX, 3),
        "extra": extra,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
