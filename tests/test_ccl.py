"""Connected components / hole filling parity vs scipy."""
import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from nellie_tpu.kernels import ccl
# compile-heavy: runs in the CI tests-slow job, not the fast path
pytestmark = pytest.mark.slow



@pytest.mark.parametrize("p", [0.2, 0.5, 0.7])
def test_label_2d_matches_scipy(rng, p):
    mask = rng.random((40, 41)) < p
    ours, n_ours = ccl.label(jnp.asarray(mask))
    ref, n_ref = ndi.label(mask, structure=np.ones((3, 3)))
    assert int(n_ours) == n_ref
    np.testing.assert_array_equal(np.asarray(ours), ref)


@pytest.mark.parametrize("p", [0.1, 0.3, 0.6])
def test_label_3d_matches_scipy(rng, p):
    mask = rng.random((12, 18, 19)) < p
    ours, n_ours = ccl.label(jnp.asarray(mask))
    ref, n_ref = ndi.label(mask, structure=np.ones((3, 3, 3)))
    assert int(n_ours) == n_ref
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_label_faces_connectivity_matches_scipy(rng):
    mask = rng.random((20, 21)) < 0.5
    ours, n_ours = ccl.label(jnp.asarray(mask), connectivity="faces")
    ref, n_ref = ndi.label(mask)  # default cross structure
    assert int(n_ours) == n_ref
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_label_snake(rng):
    # worst case for naive propagation: one long winding path
    mask = np.zeros((30, 30), bool)
    for r in range(30):
        mask[r, :] = True
        if r % 2 == 0:
            mask[r, -1] = r == 29 or True
    mask[::2, -1] = True
    ours, n_ours = ccl.label(jnp.asarray(mask))
    ref, n_ref = ndi.label(mask, structure=np.ones((3, 3)))
    assert int(n_ours) == n_ref
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_fill_holes_matches_scipy(rng):
    mask = np.zeros((24, 25), bool)
    mask[4:20, 4:20] = True
    mask[8:12, 8:12] = False  # a hole
    mask[0:2, 0:2] = True     # touching border, no hole
    ours = np.asarray(ccl.fill_holes(jnp.asarray(mask)))
    ref = ndi.binary_fill_holes(mask)
    np.testing.assert_array_equal(ours, ref)


def test_fill_holes_3d(rng):
    mask = np.zeros((10, 12, 12), bool)
    mask[2:9, 2:10, 2:10] = True
    mask[4:6, 4:7, 4:7] = False  # internal cavity
    ours = np.asarray(ccl.fill_holes(jnp.asarray(mask)))
    ref = ndi.binary_fill_holes(mask)
    np.testing.assert_array_equal(ours, ref)


def test_remove_small_components(rng):
    mask = np.zeros((20, 20), bool)
    mask[1:3, 1:3] = True    # size 4
    mask[10:18, 10:18] = True  # size 64
    out = np.asarray(ccl.remove_small_components(jnp.asarray(mask), 10))
    assert not out[1:3, 1:3].any()
    assert out[10:18, 10:18].all()


@pytest.mark.parametrize("min_size", [2, 3, 4, 10])
def test_remove_small_matches_scipy_random_3d(rng, min_size):
    """Bounded-hop fast path == scipy bincount area filter, exact, on
    random clumpy 3D masks (mixture of sizes around the threshold)."""
    mask = ndi.binary_dilation(rng.random((14, 30, 30)) > 0.93)
    ours = np.asarray(ccl.remove_small_components(jnp.asarray(mask), min_size))
    labels, _ = ndi.label(mask, structure=np.ones((3, 3, 3)))
    sizes = np.bincount(labels.ravel())
    sizes[0] = 0
    ref = (sizes >= min_size)[labels]
    np.testing.assert_array_equal(ours, ref)


def test_remove_small_matches_scipy_random_2d(rng):
    mask = rng.random((64, 64)) > 0.75
    ours = np.asarray(ccl.remove_small_components(jnp.asarray(mask), 5))
    labels, _ = ndi.label(mask, structure=np.ones((3, 3)))
    sizes = np.bincount(labels.ravel())
    sizes[0] = 0
    ref = (sizes >= 5)[labels]
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("shape,min_size", [
    ((6, 8), 7), ((5, 40), 10), ((40, 7), 8),   # 2D: one axis <= 2*hops
    ((3, 4, 30), 3), ((4, 24, 4), 4),           # 3D slabs/columns
])
def test_remove_small_narrow_shapes_match_scipy(rng, shape, min_size):
    """Axis extents <= 2*hops alias linear offset deltas in the stencil
    form (e.g. (1,-3) vs (0,5) at width 8); these shapes must take the
    scatter path and stay scipy-exact."""
    structure = np.ones((3,) * len(shape))
    for seed in range(4):
        r = np.random.default_rng(seed)
        mask = r.random(shape) > 0.6
        ours = np.asarray(ccl.remove_small_components(jnp.asarray(mask), min_size))
        labels, _ = ndi.label(mask, structure=structure)
        sizes = np.bincount(labels.ravel())
        sizes[0] = 0
        ref = (sizes >= min_size)[labels]
        np.testing.assert_array_equal(ours, ref, err_msg=f"{shape} seed {seed}")


def test_remove_small_fallback_paths(rng):
    """faces connectivity and min_size past the hop budget take the full
    union-find path; answers must agree with scipy either way."""
    mask = ndi.binary_dilation(rng.random((10, 24, 24)) > 0.9)
    out_faces = np.asarray(
        ccl.remove_small_components(jnp.asarray(mask), 4, connectivity="faces"))
    labels, _ = ndi.label(mask)  # default cross structure = faces
    sizes = np.bincount(labels.ravel())
    sizes[0] = 0
    np.testing.assert_array_equal(out_faces, (sizes >= 4)[labels])

    big = ccl._SMALL_HOPS_MAX + 3
    out_big = np.asarray(ccl.remove_small_components(jnp.asarray(mask), big))
    labels_f, _ = ndi.label(mask, structure=np.ones((3, 3, 3)))
    sizes_f = np.bincount(labels_f.ravel())
    sizes_f[0] = 0
    np.testing.assert_array_equal(out_big, (sizes_f >= big)[labels_f])


def test_union_find_pair_monoid_fallback(monkeypatch):
    """Volumes too large for the uint32 run-id encoding fall back to the
    (reset, value) pair monoid — force that path and check parity."""
    rng = np.random.default_rng(11)
    mask = rng.random((6, 17, 13)) > 0.6
    want = np.asarray(ccl.union_find_roots(jnp.asarray(mask), "full"))
    monkeypatch.setattr(ccl, "_encoded_scan_keys", lambda *a, **k: None)
    got = np.asarray(ccl.union_find_roots.__wrapped__(jnp.asarray(mask), "full"))
    np.testing.assert_array_equal(got, want)


def test_fill_holes_staircase_wall_no_diagonal_tunnel():
    """A cavity sealed by a 1-thick *staircase* wall: face-connectivity
    background flood must NOT tunnel diagonally through wall corners
    (regression: sequential shift accumulation let reachability cross
    two offsets in one round and marked the cavity as outside)."""
    import scipy.ndimage as ndi

    rng = np.random.default_rng(5)
    z, y, x = np.mgrid[0:24, 0:48, 0:48]
    # curved tube shell (staircase in discretization) with hollow core
    r2 = (y - 24 - 6*np.sin(x / 7.0))**2 + (z - 12 + 3*np.cos(x / 5.0))**2
    mask = (r2 < 64) & (r2 > 9)          # hollow curved tube, open ends
    mask[:, :, :2] = False               # keep ends open in x
    mask[:, :, -2:] = False
    mask |= rng.random(mask.shape) > 0.97
    got = np.asarray(ccl.fill_holes(jnp.asarray(mask)))
    want = ndi.binary_fill_holes(mask)
    np.testing.assert_array_equal(got, want)
