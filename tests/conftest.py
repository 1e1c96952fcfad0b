"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding correctness is tested
on host-platform virtual devices (the reference's analogous strategy is
chunked-vs-full parity testing, see SURVEY.md §4).
"""
import os

# Must be set before the jax backend initialises.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon site hook (PYTHONPATH=/root/.axon_site) force-overrides
# jax_platforms to the tunnelled TPU; undo that for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
