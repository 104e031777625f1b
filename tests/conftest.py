"""Test harness: force JAX onto a virtual 8-device CPU mesh.

Must run before anything imports jax (pytest loads conftest first).  This is
the standard trick for testing TPU sharding logic without TPU hardware
(SURVEY §4): the same SPMD program runs on 8 host devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
