"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes any backend.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if env preset to tpu/axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon PJRT plugin overrides JAX_PLATFORMS at import time; force CPU via
# the config API before any backend initializes.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
