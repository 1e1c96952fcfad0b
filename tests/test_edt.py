"""JFA distance-transform tests vs scipy exact EDT."""
import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from nellie_tpu.kernels import edt


def test_distance_transform_matches_scipy_2d(rng):
    mask = rng.random((48, 50)) > 0.3
    ours = np.asarray(edt.distance_transform(jnp.asarray(mask)))
    ref = ndi.distance_transform_edt(mask)
    # JFA+1: near-exact; allow rare tiny deviations
    close = np.isclose(ours, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.999
    np.testing.assert_allclose(ours[close], ref[close])


def test_distance_transform_anisotropic_3d(rng):
    mask = np.zeros((12, 24, 24), bool)
    mask[3:9, 6:18, 6:18] = True
    sampling = (0.5, 0.2, 0.2)
    ours = np.asarray(edt.distance_transform(jnp.asarray(mask), sampling=sampling))
    ref = ndi.distance_transform_edt(mask, sampling=sampling)
    close = np.isclose(ours, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.999


def test_nearest_seed_labels_match_scipy_indices(rng):
    # seeds at a few random points; nearest-seed labels vs scipy's
    # return_indices on the inverted seed mask
    shape = (40, 41)
    seed_mask = np.zeros(shape, bool)
    pts = [(5, 5), (30, 10), (20, 35), (38, 38)]
    seed_labels = np.zeros(shape, np.int32)
    for i, p in enumerate(pts):
        seed_mask[p] = True
        seed_labels[p] = i + 1
    ours, dist = edt.nearest_seed(jnp.asarray(seed_labels))
    ours = np.asarray(ours)
    idx = ndi.distance_transform_edt(~seed_mask, return_distances=False, return_indices=True)
    ref = seed_labels[tuple(idx)]
    # ties can break either way; demand near-total agreement
    assert (ours == ref).mean() > 0.99
    assert (ours > 0).all()


def test_nearest_seed_object_constraint():
    # two objects side by side; object B's seed must not leak into A
    obj = np.zeros((20, 40), np.int32)
    obj[5:15, 2:18] = 1
    obj[5:15, 22:38] = 2
    seeds = np.zeros_like(obj)
    seeds[10, 30] = 7  # only object 2 has a seed
    labels, dist = edt.nearest_seed(jnp.asarray(seeds), jnp.asarray(obj))
    labels = np.asarray(labels)
    assert (labels[obj == 1] == 0).all()       # no seed of its own
    assert (labels[obj == 2] == 7).all()       # fully claimed
