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

if not os.environ.get("BIRDNET_TEST_TPU"):
    # jax may already be imported (pytest plugin autoload latches config at
    # import time); update the live config too.
    import jax

    jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(42)
