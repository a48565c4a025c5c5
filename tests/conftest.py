"""Test harness setup: force the CPU backend with 8 virtual devices.

Multi-device tests run on a fake 8-device CPU mesh (the standard JAX
substitute for a real slice).  The axon sitecustomize registers the TPU
plugin at interpreter start and pins JAX_PLATFORMS=axon, so the override must
go through jax.config after import -- plain env vars are not enough.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)
