"""Test configuration.

Tests run on CPU with 8 fake XLA devices so sharding semantics are exercised
without TPU hardware (SURVEY.md §4.2 'fake-backend note'); Pallas kernels are
tested in interpreter mode. The benchmark (bench.py) runs on the real chip.

The harness pre-imports jax from sitecustomize with JAX_PLATFORMS=axon (the
tunneled TPU), so the env var is already latched — the platform must be forced
through jax.config instead. XLA_FLAGS is still read at backend-client creation,
which has not happened yet at conftest time.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="session")
def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
    yield
