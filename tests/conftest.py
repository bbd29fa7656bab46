"""Test environment: hermetic CPU backend with 8 virtual devices.

Sharding tests exercise the multi-chip path on a virtual 8-device CPU mesh
(the standard way to test TPU-pod collectives without a pod — SURVEY §4).
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# Note: a sitecustomize (PYTHONPATH=/root/.axon_site on the TPU host) may
# force JAX_PLATFORMS to the TPU plugin; the jax.config.update below wins.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices (XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    return devs[:8]
