"""AOT executable cache: reference-class time-to-first-pixel.

The reference pays its full init (parse + BVH + upload + first frame) in
seconds because CUDA kernels are compiled at build time (main.cu:258-266
times 10.35 s for bunny INCLUDING the first frame).  Here the first frame
of a (scene shapes, W, H, config) combination costs minutes of XLA+Mosaic
compile on the TPU backend, and — measured, round 5 — JAX's persistent
compilation cache does NOT recover it on this PJRT backend: the cache
*hits* (the StableHLO fingerprint is process-stable; the round-4 theory
that Pallas fingerprints drift was wrong) but the hit path still costs as
much as the compile, because deserializing through the hit path recompiles
server-side.  ``jax.experimental.serialize_executable`` round-trips the
SAME executable in ~0.2 s in a fresh process.

So the framework keeps its own executable cache: after the first compile
of a step function, the serialized executable is written next to the JAX
cache keyed by a hash of the lowered StableHLO (process-stable, verified
across processes) + jax/backend versions; later processes
``deserialize_and_load`` in well under a second.  Any failure on the load
path (version drift, incompatible topology) silently falls back to a
fresh compile-and-store.

Enabled only on the TPU backend (CPU compiles are seconds and tests churn
many tiny shapes); opt out entirely with ``PT_AOT_CACHE=0``.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile
import time

log = logging.getLogger(__name__)

_MIN_STORE_COMPILE_S = 3.0     # don't bother persisting trivial compiles


def cache_dir() -> str:
    d = os.environ.get("PT_AOT_CACHE_DIR",
                       os.path.expanduser("~/.cache/pathtracer_tpu_aot"))
    os.makedirs(d, exist_ok=True)
    return d


def enabled() -> bool:
    if os.environ.get("PT_AOT_CACHE", "1") == "0":
        return False
    import jax
    return jax.default_backend() == "tpu"


def _canonicalize(txt: str) -> str:
    """Replace every embedded base64 kernel payload (Mosaic module
    bytecode inside tpu_custom_call backend_config) with a placeholder.

    The bytecode embeds source locations including the PATH OF THE
    INVOKING SCRIPT (measured r5: the same render lowered from
    tools/bench_large_stage.py vs another script differed only by that
    path — and scrubbing the string still leaves its LENGTH in the
    bytecode's string-table offsets), so any hash over those bytes
    re-keys the cache per caller.  The payloads are therefore dropped
    from the key entirely; what they encode — the kernel code — is
    covered instead by hashing the kernel SOURCE files and the PT_*
    tuning knobs (_kernel_source_key), which is deterministic and can
    never stale-hit: kernels are pure functions of (source, knobs,
    shapes), and shapes/statics live in the outer module text kept
    here."""
    import re

    # the payload sits in escaped JSON: ...\22body\22: \22<b64>\22...
    return re.sub(r'(body\\+22:\s*\\+22)([A-Za-z0-9+/=]{1000,})',
                  lambda m: m.group(1) + "PALLAS_PAYLOAD", txt)


def _kernel_source_key() -> bytes:
    """Digest of everything (besides the outer HLO) the compiled kernels
    are a function of: the compute-kernel source files and the PT_*
    tuning env knobs."""
    h = hashlib.sha256()
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel in ("ops", "models", "experiments"):
        d = os.path.join(pkg, rel)
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if name.endswith(".py"):
                with open(os.path.join(d, name), "rb") as f:
                    h.update(name.encode())
                    h.update(f.read())
    for k in sorted(os.environ):
        if k.startswith("PT_") and not k.startswith("PT_AOT"):
            h.update(f"{k}={os.environ[k]}".encode())
    return h.digest()


def _key(lowered, extra: str = "") -> str:
    import jax
    from jax._src import xla_bridge
    h = hashlib.sha256()
    txt = _canonicalize(lowered.as_text())
    dump = os.environ.get("PT_AOT_DUMP")
    if dump:                              # debugging: find unstable bytes
        with open(dump, "w") as f:
            f.write(txt)
    h.update(txt.encode())
    h.update(_kernel_source_key())
    h.update(jax.__version__.encode())
    try:
        h.update(xla_bridge.get_backend().platform_version.encode())
    except Exception:
        pass
    h.update(str(jax.device_count()).encode())
    h.update(extra.encode())
    return h.hexdigest()


def cached_compile(jitted, *args, tag: str = "", **kwargs):
    """``jitted.lower(*args, **kwargs)`` -> load-or-compile the executable.

    Returns a ``jax.stages.Compiled``; call it with the same (non-static)
    argument pytree as the lowering.  Static args are baked in.  When the
    cache is disabled this is exactly ``.lower().compile()``.
    """
    lowered = jitted.lower(*args, **kwargs)
    if not enabled():
        return lowered.compile()

    from jax.experimental import serialize_executable

    path = os.path.join(cache_dir(), f"{tag or 'exe'}-{_key(lowered, tag)}")
    if os.path.exists(path):
        try:
            t0 = time.perf_counter()
            with open(path, "rb") as f:
                blob, in_tree, out_tree = pickle.load(f)
            exe = serialize_executable.deserialize_and_load(
                blob, in_tree, out_tree)
            log.info("AOT cache hit %s (%.2fs load)", os.path.basename(path),
                     time.perf_counter() - t0)
            return exe
        except Exception as e:            # version drift etc: recompile
            log.warning("AOT cache load failed (%s: %s); recompiling",
                        type(e).__name__, e)
            try:
                os.unlink(path)
            except OSError:
                pass

    t0 = time.perf_counter()
    exe = lowered.compile()
    dt = time.perf_counter() - t0
    if dt >= _MIN_STORE_COMPILE_S:
        try:
            blob, in_tree, out_tree = serialize_executable.serialize(exe)
            fd, tmp = tempfile.mkstemp(dir=cache_dir())
            with os.fdopen(fd, "wb") as f:
                pickle.dump((blob, in_tree, out_tree), f)
            os.replace(tmp, path)         # atomic: concurrent procs safe
            log.info("AOT cache store %s (%.1fs compile, %d bytes)",
                     os.path.basename(path), dt, len(blob))
        except Exception as e:            # never fail a render over caching
            log.warning("AOT cache store failed (%s: %s)",
                        type(e).__name__, e)
    return exe
