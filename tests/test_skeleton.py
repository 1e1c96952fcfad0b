"""Thinning tests: topology preservation, thinness, idempotence."""
import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from nellie_tpu.kernels import ccl
from nellie_tpu.kernels.skeleton import skeletonize, skeletonize_2d, skeletonize_3d
# compile-heavy: runs in the CI tests-slow job, not the fast path
pytestmark = pytest.mark.slow



def _n_components(mask, full=True):
    structure = np.ones((3,) * mask.ndim) if full else None
    _, n = ndi.label(mask, structure=structure)
    return n


def _blobby_volume(shape, n, seed, r=4):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, bool)
    grids = np.mgrid[tuple(slice(0, s) for s in shape)]
    for _ in range(n):
        c = [rng.integers(r, s - r) for s in shape]
        dist = sum((g - ci) ** 2 for g, ci in zip(grids, c))
        vol |= dist <= r * r
    return vol


def test_3d_preserves_components(rng):
    mask = _blobby_volume((24, 40, 40), 5, seed=1)
    skel = np.asarray(skeletonize_3d(jnp.asarray(mask)))
    assert skel.sum() > 0
    assert (skel & ~mask).sum() == 0  # skeleton within mask
    assert _n_components(skel) == _n_components(mask)


def test_3d_tube_thins_to_curve():
    z, y, x = np.mgrid[0:16, 0:16, 0:64]
    mask = ((z - 8) ** 2 + (y - 8) ** 2) <= 9  # straight tube along x
    skel = np.asarray(skeletonize_3d(jnp.asarray(mask)))
    # curve: ~one voxel per x slice, spanning the tube's length
    per_slice = skel.sum(axis=(0, 1))
    assert per_slice.max() <= 3
    assert (per_slice >= 1).mean() > 0.9
    assert _n_components(skel) == 1


def test_3d_torus_preserves_loop():
    z, y, x = np.mgrid[0:12, 0:48, 0:48]
    r_major, r_minor = 14.0, 3.0
    rad = np.sqrt((y - 24.0) ** 2 + (x - 24.0) ** 2)
    mask = ((rad - r_major) ** 2 + (z - 6.0) ** 2) <= r_minor**2
    skel = np.asarray(skeletonize_3d(jnp.asarray(mask)))
    assert _n_components(skel) == 1
    # the cycle must survive: the z-projection of the skeleton encloses a hole
    proj = skel.max(axis=0)
    filled = ndi.binary_fill_holes(proj)
    assert filled.sum() > proj.sum() + 100
    # spur branches are normal thinning artifacts, but should be few
    neigh = ndi.convolve(skel.astype(int), np.ones((3, 3, 3)), mode="constant") - skel
    n_endpoints = ((neigh == 1) & skel).sum()
    assert n_endpoints <= 24
    assert skel.sum() >= 2 * np.pi * r_major * 0.5  # a real cycle, not a point


def test_3d_idempotent():
    mask = _blobby_volume((16, 32, 32), 3, seed=2)
    skel1 = np.asarray(skeletonize_3d(jnp.asarray(mask)))
    skel2 = np.asarray(skeletonize_3d(jnp.asarray(skel1)))
    np.testing.assert_array_equal(skel1, skel2)


def test_2d_preserves_components(rng):
    mask = _blobby_volume((64, 64), 4, seed=3, r=6)
    skel = np.asarray(skeletonize_2d(jnp.asarray(mask)))
    assert (skel & ~mask).sum() == 0
    assert _n_components(skel) == _n_components(mask)
    # thin: no 2x2 solid squares
    sq = skel[:-1, :-1] & skel[1:, :-1] & skel[:-1, 1:] & skel[1:, 1:]
    assert sq.sum() == 0


def test_2d_ring_preserves_hole():
    y, x = np.mgrid[0:48, 0:48]
    rad = np.sqrt((y - 24.0) ** 2 + (x - 24.0) ** 2)
    mask = (rad > 10) & (rad < 17)
    skel = np.asarray(skeletonize_2d(jnp.asarray(mask)))
    assert _n_components(skel) == 1
    filled = ndi.binary_fill_holes(skel)
    assert filled.sum() > skel.sum()  # still encloses a hole


def test_dispatch():
    m2 = np.zeros((8, 8), bool)
    m2[2:6, 2:6] = True
    m3 = np.zeros((6, 8, 8), bool)
    m3[2:4, 2:6, 2:6] = True
    assert np.asarray(skeletonize(jnp.asarray(m2))).sum() > 0
    assert np.asarray(skeletonize(jnp.asarray(m3))).sum() > 0
