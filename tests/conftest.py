"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware. Must run before jax is imported anywhere."""

import os

# Force CPU even when the environment points at a TPU (JAX_PLATFORMS=axon):
# the suite must be hardware-independent and needs 8 virtual devices. The
# axon sitecustomize registers its platform at interpreter start, so the env
# var alone is not enough — override the jax config after import too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1)
