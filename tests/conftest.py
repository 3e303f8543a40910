"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (real-TPU runs use bench.py / the driver).
Environment must be set before the first jax import.
"""

import os
import sys

# Force CPU for the test suite (the session env pins JAX_PLATFORMS=axon for
# the real chip; tests must run on the virtual 8-device CPU mesh).
# Set BIRDNET_TEST_TPU=1 to run tests against real hardware instead.
if not os.environ.get("BIRDNET_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import pytest  # noqa: E402

ON_TPU = bool(os.environ.get("BIRDNET_TEST_TPU"))
if not ON_TPU:
    # jax may already be imported (pytest plugin autoload latches config at
    # import time); update the live config too.
    import jax

    jax.config.update("jax_platforms", "cpu")

# Modules whose numeric oracles assume fp32 (CPU) execution; on real TPU the
# default conv/matmul passes are bf16-based and those tolerances don't apply.
_CPU_ORACLE_MODULES = {
    "test_compiler_ops",
    "test_compiler_ops_extra",
    "test_signal_ops",
    "test_resample",
    "test_pallas_frontend",
    "test_rnn_ops",  # fp32 torch-oracle tolerances; TPU matmuls use bf16 passes
    "test_stage123",  # interpret-mode f32 oracle; on TPU BOTH sides run
    #                   f32-via-bf16 with different op orders (flaky ~4e-4)
    "test_external_onnx",  # fp32 parity ≤1e-4 vs torch-CPU
    "test_ops_extended",  # fp32 torch-oracle tolerances (grid_sample etc.)
    "test_qdq_fusion",  # exact fused-vs-unfused equality (fusion groupings
    #                     compile differently under TPU bf16 passes)
    "test_fuse_stft_frontend",  # bit-identical fallback + f64 oracle, CPU
    #                             semantics by design (docstrings say so)
    "test_contrib_ops",  # numpy/torch fp32 oracles ≤1e-4
    "test_modern_dtypes",  # fp32/fp8 exact-value oracles
    "test_external_full_models",  # fp32 parity vs torch-CPU
    "test_random_torch_graphs",  # fp32 parity ≤5e-4 vs torch-CPU
    "test_ops_wave3",  # fp32 torch-oracle tolerances (Attention etc.)
    "test_elementwise_sweep",  # fp32 numpy-oracle tolerances
}
# Modules that need the 8-device virtual mesh.
_MESH_MODULES = {"test_sharding", "test_sharded_classifier"}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "cpu_oracle: numeric assertion assumes fp32 (CPU) execution; "
        "skipped on real TPU where default passes are bf16-based",
    )


def pytest_collection_modifyitems(config, items):
    if not ON_TPU:
        return
    import jax

    n_devices = len(jax.devices())
    skip_oracle = pytest.mark.skip(
        reason="fp32 CPU oracle comparison; not meaningful under TPU bf16 passes"
    )
    skip_mesh = pytest.mark.skip(
        reason=f"needs an 8-device mesh; only {n_devices} real device(s)"
    )
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _CPU_ORACLE_MODULES or item.get_closest_marker("cpu_oracle"):
            item.add_marker(skip_oracle)
        elif mod in _MESH_MODULES and n_devices < 8:
            item.add_marker(skip_mesh)


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(42)
