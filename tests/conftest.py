"""Test configuration: force an 8-device virtual CPU mesh with x64.

Tests validate numerics in float64 on CPU (matching the reference's
double-precision results) and exercise multi-chip sharding on a virtual
8-device mesh, per the reference test strategy (SURVEY.md §4): correctness is
hermetic and hardware-free; TPU hardware only runs the benchmarks.

NOTE: this environment registers an 'axon' TPU backend via sitecustomize and
pins jax_platforms='axon,cpu'; overriding the config (not just the env var)
before first backend use is required.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    devices = jax.devices()
    assert devices[0].platform == "cpu", f"tests must run on CPU, got {devices}"
    assert len(devices) == 8, f"expected 8 virtual devices, got {len(devices)}"
    yield
