"""Profiling and phase timing.

The reference exposes verbose per-phase timings in the CLI and an external
batch-sweep script sampling nvidia-smi (reference:
birdnet-analyze.rs:284-316, scripts/README.md:20-46). TPU equivalents:

- :class:`PhaseTimer` — named phase timings (init/build/read/chunk/batch);
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of XLA execution;
- :func:`device_memory_stats` — HBM usage snapshot (the nvidia-smi analog);
- ``scripts/batch_sweep.py`` — the sweep driver built on these.

Timing caveat baked in: ``jax.block_until_ready`` can lie under tunneled
platforms (acks before completion), so honest wall timing must force a host
readback — :func:`sync` does.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


def sync(tree) -> None:
    """Force completion of device work by reading back one element of every
    array in the pytree (block_until_ready is insufficient on tunneled
    platforms)."""
    import jax

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "addressable_shards") or hasattr(leaf, "device"):
            # One element only: a full np.asarray(leaf) would add the whole
            # output's device→host transfer into the measured time, which
            # the real inference path never pays.
            if getattr(leaf, "size", 0):
                np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])
            else:
                np.asarray(leaf)


@dataclass
class PhaseTimer:
    """Accumulates named phase durations; printable summary."""

    phases: Dict[str, float] = field(default_factory=dict)
    order: List[str] = field(default_factory=list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            if name not in self.phases:
                self.order.append(name)
                self.phases[name] = 0.0
            self.phases[name] += dt

    def summary(self) -> str:
        total = sum(self.phases.values())
        lines = [f"{'phase':<24}{'seconds':>10}{'share':>8}"]
        for name in self.order:
            dt = self.phases[name]
            share = dt / total * 100 if total else 0.0
            lines.append(f"{name:<24}{dt:>10.3f}{share:>7.1f}%")
        lines.append(f"{'total':<24}{total:>10.3f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (open with TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """HBM usage snapshot for a device (None where unsupported)."""
    import jax

    if device is None:
        devices = jax.devices()
        if not devices:
            return None
        device = devices[0]
    stats = getattr(device, "memory_stats", None)
    if stats is None:
        return None
    try:
        return dict(stats() or {})
    except Exception:  # noqa: BLE001 - backend-dependent
        return None
