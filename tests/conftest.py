"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes any backend.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if env preset to tpu/axon
# NOTE on the persistent XLA compile cache: measured r4 — it does NOT help
# this suite (cold 17:48 vs warm-with-cache 21:08; only 56 programs exceed
# the 1 s threshold). The tier's cost is Python-side tracing + many tiny
# compiles, so speed comes from tier placement and small configs instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Tests are compile-bound on this 1-core host (the suite compiles hundreds
# of tiny programs once each); skipping XLA's backend optimization pipeline
# measured ~25% off suite wall time with all tests green. Production code
# paths never see this flag. Opt out with TEST_XLA_OPT=1 (e.g. when
# debugging a numerics difference that only appears at -O0).
if "xla_backend_optimization_level" not in flags \
        and os.environ.get("TEST_XLA_OPT") != "1":
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags

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
