"""Test configuration: force CPU with 8 virtual devices.

Tests must run without TPU hardware; the multi-chip sharding tests use the
virtual CPU mesh (XLA_FLAGS host platform device count), the same mechanism
the driver's dryrun uses.
"""
import os

# Hard override: the environment's sitecustomize registers the axon TPU
# tunnel backend and pins it regardless of the JAX_PLATFORMS env var; tests
# must run on local CPU or every op dispatch becomes a network roundtrip.
# jax.config.update wins over the sitecustomize registration.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
