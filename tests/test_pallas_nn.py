"""Nearest-neighbour kernel tests (XLA path on CPU; the Pallas path runs
on TPU and is cross-checked against the same formulation)."""
import numpy as np
import pytest

from nellie_tpu.kernels.pallas_nn import nearest_neighbors


def test_nearest_neighbors_matches_bruteforce(rng):
    q = rng.random((300, 3)).astype(np.float32) * 50
    r = rng.random((700, 3)).astype(np.float32) * 50
    dist, idx = nearest_neighbors(q, r)
    d2 = np.sum((q[:, None, :] - r[None, :, :]) ** 2, axis=2)
    ref_idx = np.argmin(d2, axis=1)
    ref_dist = np.sqrt(d2[np.arange(len(q)), ref_idx])
    np.testing.assert_allclose(dist, ref_dist, rtol=1e-3, atol=1e-3)
    # ties may break differently; distances must agree
    np.testing.assert_allclose(
        np.sqrt(d2[np.arange(len(q)), idx]), ref_dist, rtol=1e-3, atol=1e-3)


def test_nearest_neighbors_chunked_refs(rng):
    q = rng.random((100, 3)).astype(np.float32) * 10
    r = rng.random((5000, 3)).astype(np.float32) * 10
    d_full, i_full = nearest_neighbors(q, r)
    d_chunk, i_chunk = nearest_neighbors(q, r, m_chunk=1024)
    np.testing.assert_allclose(d_full, d_chunk, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(i_full, i_chunk)


def test_nearest_neighbors_empty():
    d, i = nearest_neighbors(np.zeros((0, 3)), np.zeros((5, 3)))
    assert d.shape == (0,) and i.shape == (0,)
