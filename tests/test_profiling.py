"""Profiling utility tests."""

import time

import jax.numpy as jnp
import numpy as np

from birdnet_tpu.utils.profiling import PhaseTimer, device_memory_stats, sync, trace


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b"):
        time.sleep(0.02)
    with t.phase("a"):
        time.sleep(0.01)
    assert t.phases["a"] >= 0.02
    assert t.phases["b"] >= 0.02
    assert t.order == ["a", "b"]
    s = t.summary()
    assert "a" in s and "b" in s and "total" in s


def test_phase_timer_records_on_exception():
    t = PhaseTimer()
    try:
        with t.phase("boom"):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert t.phases["boom"] >= 0.0


def test_sync_forces_readback():
    x = jnp.ones((4, 4)) * 2.0
    sync({"a": x, "b": [x, x]})  # must not raise


def test_trace_writes_files(tmp_path):
    with trace(str(tmp_path)):
        jnp.sum(jnp.ones(128)).block_until_ready()
    assert any(tmp_path.rglob("*"))


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert stats is None or isinstance(stats, dict)
