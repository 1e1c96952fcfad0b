"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding correctness is tested
on host-platform virtual devices (the reference's analogous strategy is
chunked-vs-full parity testing, see SURVEY.md §4).
"""
import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
