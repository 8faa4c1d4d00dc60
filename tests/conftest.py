"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip
sharding code paths (jax.sharding.Mesh over data/model axes) are
exercised without TPU hardware — mirroring the reference's strategy of
running "cluster" jobs locally via run.pl (SURVEY.md §4: distributed
testing without a cluster).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
