"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip
sharding code paths (jax.sharding.Mesh over data/model axes) are
exercised without TPU hardware — mirroring the reference's strategy of
running "cluster" jobs locally via run.pl (SURVEY.md §4: distributed
testing without a cluster).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize registers the 'axon' TPU backend and
# forces jax_platforms to "axon,cpu"; pin tests to CPU explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for mesh tests"


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
