"""Test harness: force an 8-device virtual CPU mesh before jax imports.

This is the TPU-native equivalent of a fake distributed backend (SURVEY.md §4):
all multi-device sharding tests run against
``--xla_force_host_platform_device_count=8`` on CPU.
"""

import os

# Force-assign: the machine image exports JAX_PLATFORMS=axon (the tunneled
# real TPU); tests must run on the virtual 8-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
