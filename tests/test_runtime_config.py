"""Runtime init + device-config tests (reference: cuda_config.rs:250-339,
tensorrt_config.rs:363-459 config-default matrices; runtime.rs:239-256)."""

import os

import pytest

from birdnet_tpu import (
    CPUConfig,
    TPUConfig,
    available_devices,
    available_execution_providers,
    init_runtime,
    is_device_available,
)
from birdnet_tpu.types import DeviceBackend


def test_tpu_config_defaults():
    cfg = TPUConfig()
    assert cfg.device_id == 0
    assert cfg.precision == "mixed"  # the TRT-fp16-on-by-default analog
    assert cfg.compilation_cache_dir is None  # default cache location
    assert cfg.donate_buffers is True
    assert cfg.memory_fraction is None


def test_cpu_config_defaults():
    cfg = CPUConfig()
    assert cfg.precision == "fp32"
    assert cfg.device_id == 0


def test_tpu_config_memory_fraction_applies():
    before = os.environ.pop("XLA_PYTHON_CLIENT_MEM_FRACTION", None)
    try:
        TPUConfig(memory_fraction=0.4).apply()
        assert os.environ["XLA_PYTHON_CLIENT_MEM_FRACTION"] == "0.4"
    finally:
        os.environ.pop("XLA_PYTHON_CLIENT_MEM_FRACTION", None)
        if before is not None:
            os.environ["XLA_PYTHON_CLIENT_MEM_FRACTION"] = before


def test_init_runtime_idempotent():
    init_runtime()
    init_runtime()  # second call is a no-op (reference: runtime.rs:138-151)


def test_available_devices_cpu_present():
    devices = available_devices()
    assert devices, "at least one device"
    assert any(d.backend is DeviceBackend.CPU for d in devices)
    # CPU sorts last (accelerators first)
    assert devices[-1].backend is DeviceBackend.CPU
    assert available_execution_providers() == devices


def test_is_device_available():
    assert is_device_available("cpu")
    assert not is_device_available("quantum")


def test_default_device_honors_device_id():
    import jax

    if len([d for d in jax.local_devices() if d.platform == "cpu"]) < 4:
        pytest.skip("needs the 8-virtual-CPU-device harness")
    # conftest forces 8 virtual CPU devices; TPUConfig.device_id's contract
    # ("chip ordinal to run on", reference: cuda_config.rs:179-182) must
    # actually select that ordinal, not silently return device 0.
    from birdnet_tpu.runtime import default_device

    d0 = default_device("cpu", device_id=0)
    d3 = default_device("cpu", device_id=3)
    assert d0 != d3
    assert d3 == [d for d in __import__("jax").local_devices() if d.platform == "cpu"][3]


def test_default_device_id_out_of_range():
    from birdnet_tpu.errors import RuntimeInitError
    from birdnet_tpu.runtime import default_device

    with pytest.raises(RuntimeInitError, match="device_id"):
        default_device("cpu", device_id=99)


def test_with_cpu_config_is_honored(tmp_path):
    import jax

    if len([d for d in jax.local_devices() if d.platform == "cpu"]) < 3:
        pytest.skip("needs the 8-virtual-CPU-device harness")
    # with_cpu(CPUConfig(...)) must store the config: precision and
    # device_id flow into the built classifier.
    from birdnet_tpu import Classifier
    from birdnet_tpu.device_config import CPUConfig
    from birdnet_tpu.models import birdnet_v24

    p = tmp_path / "tiny.onnx"
    birdnet_v24.save_tiny(p, num_species=5)
    clf = (
        Classifier.builder()
        .model_path(str(p))
        .labels([f"s{i}" for i in range(5)])
        .with_cpu(CPUConfig(precision="fp32", device_id=2))
        .build()
    )
    import jax

    cpus = [d for d in jax.local_devices() if d.platform == "cpu"]
    assert clf.device == cpus[2]


def test_gpu_provider_errors_cleanly_when_absent():
    """--provider gpu / .device("gpu") on a machine with no GPU must fail
    with a clear RuntimeInitError, not silently fall back (the reference
    validates provider availability up front,
    src/execution_providers.rs:35-58). GPU is accepted but second-class:
    this framework is TPU-first (see README)."""
    import birdnet_tpu.errors as E
    from birdnet_tpu.runtime import default_device

    if is_device_available("gpu"):  # pragma: no cover - no GPU in CI
        return
    try:
        default_device("gpu")
    except E.RuntimeInitError as e:
        assert "gpu" in str(e).lower()
    else:  # pragma: no cover
        raise AssertionError("expected RuntimeInitError for absent gpu")


def test_cache_scope_isolates_targets(tmp_path, monkeypatch):
    """The persistent compile cache must be scoped per target: XLA:CPU AOT
    results are ISA-specific and the persistent-cache key does not include
    machine features, so a flat dir shared across hosts can load an
    executable compiled for a different CPU (XLA warns 'could lead to
    SIGILL'). CPU scope = 'cpu-<flags fingerprint>'; accelerator
    executables are host-independent and scope by backend name."""
    import jax

    from birdnet_tpu.runtime import _cache_scope, _set_cache_dir

    scope = _cache_scope()
    if jax.default_backend() == "cpu":
        assert scope.startswith("cpu-") and len(scope) > 4
    else:
        assert scope == jax.default_backend()

    base = str(tmp_path / "xla")
    old = jax.config.jax_compilation_cache_dir
    try:
        _set_cache_dir(base)
        assert jax.config.jax_compilation_cache_dir == os.path.join(
            base, scope
        )
        assert os.path.isdir(os.path.join(base, scope))
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
