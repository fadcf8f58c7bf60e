"""Test config: CPU-only with 8 virtual devices (the simulated multi-host
mesh the reference cannot test without real MPI — SURVEY.md §4 takeaway),
and float64 enabled for oracle-grade accuracy.

Note: the environment preimports jax with JAX_PLATFORMS=axon (TPU) via
sitecustomize, so we must override through jax.config (still possible
before first backend initialization), not through os.environ alone."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running acceptance tests (still run in CI)")
