"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is testable without a pod (SURVEY §4 gap-closure:
mocked-mesh distributed tests, which the reference lacks entirely)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# The environment's sitecustomize registers a remote-TPU ("axon") backend
# and force-sets jax_platforms=axon,cpu; unit tests must run on the
# virtual CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
