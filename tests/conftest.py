"""Test configuration.

Tests run on CPU with 8 fake XLA devices so sharding semantics are exercised
without TPU hardware (SURVEY.md §4.2 'fake-backend note'); Pallas kernels are
tested in interpreter mode. The benchmark (bench.py) runs on the real chip.

Environment must be set before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
