"""Test harness: force JAX onto a virtual 8-device CPU mesh.

The axon TPU plugin in this image registers itself programmatically and
ignores the ``JAX_PLATFORMS`` env var, so the platform must be forced via
``jax.config`` before any backend is initialized.  This is the standard
trick for testing TPU sharding logic without TPU hardware (SURVEY §4): the
same SPMD programs run on 8 virtual host devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
