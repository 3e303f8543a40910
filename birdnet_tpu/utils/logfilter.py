"""Suppress known-cosmetic native (C++) log lines on user-facing paths.

XLA's CPU AOT loader logs an ERROR block on EVERY deserialization of a
persistently-cached CPU executable: the cached entry's feature list
includes the XLA pseudo-features ``+prefer-no-scatter`` /
``+prefer-no-gather``, which are compiler scheduling hints — never host
CPU features — so the loader's compile-vs-host feature comparison always
"fails" on them and prints a multi-kilobyte "could lead to execution
errors such as SIGILL" line (``cpu_aot_loader.cc:210``) even on the exact
machine that produced the cache entry. Scoping the cache key per CPU-ISA
fingerprint (round 3) cannot silence it, because the mismatch is
pseudo-feature-vs-host, not machine-vs-machine.

The reference CLI's first screen is clean (reference:
src/bin/birdnet-analyze.rs:621-647); ours must be too. The lines are
emitted by native code writing to file descriptor 2 directly, below
Python's ``sys.stderr``, so the only interception seam is the fd itself:
``filter_native_stderr`` routes fd 2 through a pipe and a pump thread
that drops exactly the known-cosmetic lines, forwarding everything else
byte-for-byte. Real diagnostics — including genuine feature-mismatch
errors from other loader sites — pass through untouched.
"""

from __future__ import annotations

import contextlib
import os
import sys
import threading
from typing import Iterable, Tuple

# Substrings identifying lines to drop. Matched within the first
# _SCAN_BYTES of each line (the log site tag sits ~40 bytes in, right
# after the severity/timestamp prefix).
_DEFAULT_SUBSTRINGS: Tuple[bytes, ...] = (b"cpu_aot_loader.cc",)

# A line is classified once this many bytes of it have been seen; longer
# prefixes stream through unbuffered so interactive partial-line output
# (prompts, progress) is not held hostage by line buffering.
_SCAN_BYTES = 256


def _pump_filter(read_fd: int, write_fd: int,
                 substrings: Tuple[bytes, ...]) -> None:
    """Forward ``read_fd`` → ``write_fd`` line-wise, dropping lines that
    contain any of ``substrings`` within their first ``_SCAN_BYTES``
    bytes. Runs until EOF on ``read_fd``; closes ``read_fd`` on exit
    (never ``write_fd``, which the caller owns).

    The pump must NEVER die while writers still hold the pipe: if the
    real stderr goes away (EPIPE under ``… 2>&1 | head``, a closed tty),
    it keeps DRAINING the pipe and discards the bytes — otherwise fd 2
    would fill after 64 KB and block every stderr write in the process.
    Partial writes (tty backpressure, EINTR) are completed in a loop."""

    sink_dead = [False]

    def emit(data: bytes) -> None:
        if sink_dead[0]:
            return
        view = memoryview(data)
        while view:
            try:
                n = os.write(write_fd, view)
            except OSError:
                sink_dead[0] = True  # drain-and-discard from here on
                return
            view = view[n:]

    def drop(segment: bytes) -> bool:
        return any(s in segment for s in substrings)

    buf = b""        # undecided prefix of the current line (scan mode)
    mode = "scan"    # scan: classifying | fwd: streaming | drop: discarding
    while True:
        try:
            chunk = os.read(read_fd, 65536)
        except OSError:
            chunk = b""
        if not chunk:
            if buf and not drop(buf):
                emit(buf)
            break
        data = buf + chunk
        buf = b""
        while data:
            if mode == "scan":
                nl = data.find(b"\n")
                if nl != -1:
                    line, data = data[: nl + 1], data[nl + 1:]
                    if not drop(line):
                        emit(line)
                elif len(data) >= _SCAN_BYTES:
                    mode = "drop" if drop(data) else "fwd"
                else:
                    buf, data = data, b""
            else:
                nl = data.find(b"\n")
                seg, data = (
                    (data, b"") if nl == -1 else (data[: nl + 1], data[nl + 1:])
                )
                if mode == "fwd":
                    emit(seg)
                if nl != -1:
                    mode = "scan"
    try:
        os.close(read_fd)
    except OSError:
        pass


@contextlib.contextmanager
def filter_native_stderr(substrings: Iterable[bytes] = _DEFAULT_SUBSTRINGS):
    """Route fd 2 through a filtering pump thread for the duration of the
    context. Installed by the CLI and serve entry points; a no-op fallback
    if fd 2 cannot be duplicated (exotic embedding hosts)."""
    subs = tuple(substrings)
    try:
        sys.stderr.flush()
    except Exception:  # noqa: BLE001 - replaced/closed stderr objects
        pass
    try:
        orig_fd = os.dup(2)
    except OSError:
        yield
        return
    read_fd, write_fd = os.pipe()
    os.dup2(write_fd, 2)
    os.close(write_fd)
    done = threading.Event()

    def run():
        try:
            _pump_filter(read_fd, orig_fd, subs)
        finally:
            done.set()

    t = threading.Thread(target=run, name="native-stderr-filter", daemon=True)
    t.start()
    try:
        yield
    finally:
        try:
            sys.stderr.flush()
        except Exception:  # noqa: BLE001
            pass
        os.dup2(orig_fd, 2)  # restore; closes the pipe's last writer → EOF
        done.wait(timeout=5.0)  # drain before anyone closes orig_fd
        os.close(orig_fd)
