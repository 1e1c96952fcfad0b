"""shard_map halo exchange: sharded stencil == single-device stencil."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nellie_tpu.kernels.filters import gaussian_filter, sum_filter
from nellie_tpu.mesh import make_mesh
from nellie_tpu.mesh.halo import halo_exchange_apply


def test_halo_exchange_sum_filter(rng):
    vol = rng.random((32, 16, 17)).astype(np.float32)
    mesh = make_mesh(8, t_axis=1)
    # zero-padded 3^3 box sum: receptive field 1 -> halo 1
    out = halo_exchange_apply(lambda b: sum_filter(b, 3), jnp.asarray(vol), mesh, halo=1)
    ref = sum_filter(jnp.asarray(vol), 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_halo_too_small_detectably_wrong(rng):
    # a halo smaller than the receptive field must NOT silently match:
    # the helper itself can't know fn's field, but this documents the contract
    vol = rng.random((32, 8, 9)).astype(np.float32)
    mesh = make_mesh(8, t_axis=1)
    fn = lambda b: sum_filter(b, 5)  # field 2 > halo 1  # noqa: E731
    out = halo_exchange_apply(fn, jnp.asarray(vol), mesh, halo=1)
    ref = sum_filter(jnp.asarray(vol), 5)
    assert not np.allclose(np.asarray(out), np.asarray(ref))


def test_halo_validation(rng):
    vol = jnp.asarray(rng.random((32, 8, 8)).astype(np.float32))
    mesh = make_mesh(8, t_axis=1)
    with pytest.raises(ValueError, match="divide evenly"):
        halo_exchange_apply(lambda b: b, jnp.asarray(rng.random((30, 8, 8)).astype(np.float32)), mesh, 1)
    with pytest.raises(ValueError, match="halo"):
        halo_exchange_apply(lambda b: b, vol, mesh, 5)
