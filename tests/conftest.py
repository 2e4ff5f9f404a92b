"""Test configuration: force JAX onto a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware.

The container's sitecustomize registers the axon TPU plugin and overrides the
``jax_platforms`` *config* (not just the env var), so we must counter-override via
jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        f"tests must run on CPU, got {jax.devices()}")
    assert jax.device_count() == 8


@pytest.fixture
def rng():
    return np.random.RandomState(1234)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-net param-fidelity traces (minutes on 1 CPU)")
