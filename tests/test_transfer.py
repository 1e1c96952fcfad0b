"""Device->host transfer narrowing: uint16 label pulls and
foreground-sparse pulls (bit-packed support + compacted values)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nellie_tpu.utils import transfer


@pytest.fixture
def small_threshold(monkeypatch):
    monkeypatch.setattr(transfer, "MIN_COMPRESS_ELEMS", 64)


def _roundtrip(arr, values=True, cap_div=transfer.SPARSE_CAP_DIV):
    prep = jax.jit(
        lambda a: transfer.sparse_prep(a, values=values, cap_div=cap_div)
    )(jnp.asarray(arr))
    return transfer.finish_sparse(prep, arr.shape, arr.dtype)


def test_sparse_roundtrip_exact(rng, small_threshold):
    for dtype in (np.float32, np.int32, np.uint8):
        arr = (rng.random((8, 16, 16)) < 0.03).astype(dtype)
        arr = arr * rng.integers(1, 100, arr.shape).astype(dtype)
        np.testing.assert_array_equal(_roundtrip(arr), arr)


def test_sparse_mask_only_roundtrip(rng, small_threshold):
    mask = (rng.random((8, 16, 16)) < 0.02).astype(np.uint8)
    got = _roundtrip(mask, values=False)
    np.testing.assert_array_equal(got, mask)


def test_sparse_all_zero_and_edge(rng, small_threshold):
    arr = np.zeros((8, 16, 16), np.float32)
    np.testing.assert_array_equal(_roundtrip(arr), arr)
    # foreground at the first and last flat positions
    arr[0, 0, 0] = 3.5
    arr[-1, -1, -1] = -2.25
    np.testing.assert_array_equal(_roundtrip(arr), arr)


def test_sparse_overflow_falls_back_dense(rng, small_threshold):
    """Density above cap -> dense fallback, still exact."""
    arr = (rng.random((8, 16, 16)) < 0.5).astype(np.float32) * 7
    got = _roundtrip(arr, cap_div=transfer.SPARSE_CAP_DIV)
    np.testing.assert_array_equal(got, arr)


def test_sparse_small_arrays_stay_dense():
    arr = np.ones((4, 4), np.float32)
    prep = transfer.sparse_prep(jnp.asarray(arr))
    assert "packed" not in prep
    np.testing.assert_array_equal(
        transfer.finish_sparse(prep, arr.shape, arr.dtype), arr)
