"""AOT executable cache: key canonicalization (utils/aotcache.py).

The Mosaic kernel payload inside tpu_custom_call backend_config embeds
the source path of the INVOKING script — and even with the string
scrubbed, its length survives in bytecode string-table offsets — so any
hash over the payload re-keys the cache per caller (measured r5).  The
key therefore drops the payloads from the lowered text and covers the
kernel code by hashing the kernel source files + PT_* env knobs.
"""
import base64
import os

from pathtracer_cuda_interactive_tpu.utils import aotcache


def _fake_module(path: bytes) -> str:
    payload = (b"MLIR\x00\x01\x02structural-bytes" * 200
               + path + b"\x03more-code-bytes" * 120)
    b64 = base64.b64encode(payload).decode().rstrip("=")
    assert len(b64) >= 1000
    return ('module @m {\n  cc backend_config = "{\\22custom_call_config'
            '\\22: {\\22body\\22: \\22' + b64 + '\\22}}"\n}')


def test_canonicalize_ignores_caller_dependent_payload():
    a = aotcache._canonicalize(_fake_module(b"/tmp/aot_dump_run.py"))
    b = aotcache._canonicalize(
        _fake_module(b"/root/repo/tools/bench_large_stage.py"))
    assert a == b
    assert "PALLAS_PAYLOAD" in a


def test_canonicalize_keeps_outer_module():
    m = _fake_module(b"/x.py")
    c = aotcache._canonicalize(m)
    assert c.startswith("module @m")
    assert "custom_call_config" in c


def test_kernel_source_key_tracks_env_knobs():
    a = aotcache._kernel_source_key()
    os.environ["PT_TRI_UNROLL_TEST_DUMMY"] = "7"
    try:
        b = aotcache._kernel_source_key()
    finally:
        del os.environ["PT_TRI_UNROLL_TEST_DUMMY"]
    c = aotcache._kernel_source_key()
    assert a != b
    assert a == c          # deterministic


def test_disabled_on_cpu_backend():
    # the test suite pins the cpu platform (conftest); the cache must
    # stay out of the way there
    assert not aotcache.enabled()
