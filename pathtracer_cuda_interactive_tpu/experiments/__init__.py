"""Experimental / retired compute paths (VERDICT r3 weak #7 / next #8).

These tracers were built, made correct, and MEASURED SLOWER than the
shipping paths on real TPU hardware; they are kept here — off the default
dispatch — as documented experiments and for their reusable machinery:

  * ``mxtrace`` — XLA MXU Plücker-matmul rounds tracer.  BENCH_r03/
    PERFLOG.md: the [M,128,4T] round intermediates are HBM-bound and the
    128-deep MXU runs at ≤8% utilization on a 10-feature contraction;
    its interval cull lives on in ops/pairtrace.py.
  * ``mx2`` / ``mx2set`` — Pallas MXU superbrick tracer.  0.09 vs the
    wavefront's 0.57 Msamples/s on bunny (BENCH_r03): its per-packet
    serial brick walk pays the measured scalar-walk costs at 16x the
    walk count.
  * ``mxset`` — Plücker coefficient tables for the above.

The persistent-lane "bricks" render mode (ops/brickkernel.py::
render_samples_bricks) is likewise retired from the renderer dispatch —
the sorted wavefront over the same BrickSet dominates it at every
measured depth — but its packet intersector is live code: the wavefront's
slim-walk engine is built on it.

Opt in explicitly:  ``RenderConfig(large_scene_mode="mx2")`` or import
from this package.  Nothing here is part of the supported perf surface.
"""
