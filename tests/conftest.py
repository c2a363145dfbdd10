"""Test harness: force an 8-device virtual CPU mesh BEFORE jax import so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 implication; the driver validates the real multi-chip path
separately via __graft_entry__.dryrun_multichip)."""
import os

# Force CPU for tests even when the session env points at a TPU platform
# (tests must be runnable anywhere; the bench runs on the real chip).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Some TPU platform plugins (e.g. 'axon') ignore JAX_PLATFORMS; pin via config
# before any backend is initialised.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
