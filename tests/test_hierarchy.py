"""Hierarchy feature extraction tests: on-device segment statistics vs the
host oracle, branch geometry stencil, border distance, regionprops."""
import numpy as np
import pytest

from nellie_tpu.kernels.segstats import (
    branch_geometry,
    group_stats_host,
    segment_nanstats,
)
from nellie_tpu.stages.hierarchical import _majority_by_label, border_distance
from nellie_tpu.utils.regionprops import regionprops


def test_segment_nanstats_vs_host_oracle(rng):
    """The round-1 parity invariant, re-targeted: device segment reductions
    must match the straightforward per-group numpy loop. n is above the
    host cutover so the device kernel actually runs."""
    from nellie_tpu.kernels.segstats import HOST_CUTOVER_N

    n, groups = HOST_CUTOVER_N + 500, 7
    values = rng.normal(5, 2, (3, n)).astype(np.float32)
    values[:, rng.random(n) < 0.1] = np.nan
    seg = rng.integers(-1, groups, n).astype(np.int32)  # -1 rows drop
    seg[seg == 3] = 2  # leave group 3 empty
    dev = segment_nanstats(values, seg, groups)
    host = group_stats_host(values, seg, groups)
    for key in dev:
        np.testing.assert_allclose(dev[key], host[key], rtol=2e-3, atol=1e-4,
                                   equal_nan=True, err_msg=key)


def test_group_stats_np_vs_host_oracle(rng):
    """The vectorised host path (small-table cutover) must match the
    per-group loop exactly."""
    from nellie_tpu.kernels.segstats import group_stats_np

    n, groups = 400, 6
    values = rng.normal(5, 2, (4, n)).astype(np.float32)
    values[:, rng.random(n) < 0.15] = np.nan
    seg = rng.integers(-1, groups, n).astype(np.int32)
    seg[seg == 2] = 1  # empty group
    a = group_stats_np(values, seg, groups)
    b = group_stats_host(values, seg, groups)
    for key in a:
        np.testing.assert_allclose(a[key], b[key], rtol=1e-8,
                                   equal_nan=True, err_msg=key)


def test_segment_nanstats_values():
    values = np.asarray([[1.0, 2.0, 3.0, np.nan, 10.0]])
    seg = np.asarray([0, 0, 0, 0, 1])
    agg = segment_nanstats(values, seg, 3)
    assert agg["mean"][0][0] == pytest.approx(2.0)
    assert agg["sum"][0][0] == pytest.approx(6.0)
    assert agg["min"][0][0] == pytest.approx(1.0)
    assert agg["max"][0][0] == pytest.approx(3.0)
    assert agg["std_dev"][0][0] == pytest.approx(np.std([1.0, 2.0, 3.0]))
    assert agg["mean"][0][1] == pytest.approx(10.0)
    assert np.isnan(agg["mean"][0][2])  # empty group
    assert np.isnan(agg["sum"][0][2])   # empty sum is NaN, not 0


def test_branch_geometry_line():
    """A straight 5-voxel line: length 4 edges, tips have degree 1."""
    skel = np.zeros((3, 3, 7), np.int32)
    skel[1, 1, 1:6] = 4
    lengths, degree = branch_geometry(skel, (1.0, 1.0, 1.0))
    assert lengths[4] == pytest.approx(4.0)
    assert degree[1, 1, 1] == 1 and degree[1, 1, 5] == 1
    assert (degree[1, 1, 2:5] == 2).all()


def test_branch_geometry_anisotropic_diagonal():
    skel = np.zeros((4, 4), np.int32)
    for i in range(4):
        skel[i, i] = 2
    lengths, degree = branch_geometry(skel, (2.0, 1.0))
    assert lengths[2] == pytest.approx(3 * np.sqrt(5.0))
    # two labels don't merge
    skel[0, 3] = 5
    lengths, _ = branch_geometry(skel, (2.0, 1.0))
    assert lengths[5] == pytest.approx(0.0)


def test_border_distance_matches_bruteforce(rng):
    border = np.zeros((10, 16, 16), bool)
    border[0, :, :] = True
    border[5, 8, 3] = True
    coords = rng.integers(0, (10, 16, 16), (50, 3))
    spacing = (0.5, 0.2, 0.2)
    got = border_distance(border, coords, spacing)
    bc = np.argwhere(border) * spacing
    want = np.sqrt(((coords * spacing)[:, None, :] - bc[None]) ** 2).sum(2).min(1) ** 0.5
    want = np.linalg.norm((coords * spacing)[:, None, :] - bc[None], axis=2).min(1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_majority_by_label():
    labels = np.array([1, 1, 1, 2, 2, 3])
    values = np.array([7, 7, 9, 5, 4, 0])
    rows = np.array([1, 2, 3, 4])
    got = _majority_by_label(labels, values, rows)
    assert got[0] == 7          # majority
    assert got[1] == 4          # tie -> smallest value (bincount argmax)
    assert got[2] == 0
    assert np.isnan(got[3])     # absent label


def test_regionprops_basic_2d():
    lab = np.zeros((20, 30), np.int64)
    lab[2:8, 3:13] = 1      # 6x10 rectangle
    lab[12:18, 20:26] = 2   # 6x6 square
    regions = regionprops(lab, spacing=(0.5, 0.5))
    assert [r.label for r in regions] == [1, 2]
    r1 = regions[0]
    assert r1.area == pytest.approx(60 * 0.25)
    assert r1.centroid[0] == pytest.approx(4.5 * 0.5)
    assert r1.centroid[1] == pytest.approx(7.5 * 0.5)
    assert r1.extent == pytest.approx(1.0)
    assert r1.solidity == pytest.approx(1.0)
    # rectangle: major axis along the longer (10*0.5) direction
    assert r1.major_axis_length > r1.minor_axis_length
    # analytic: 4*sqrt(var) with var = (n^2-1)/12 * s^2 for a discrete box
    expected_maj = 4 * np.sqrt((10**2 - 1) / 12) * 0.5
    assert r1.major_axis_length == pytest.approx(expected_maj, rel=1e-6)


def test_regionprops_solidity_concave():
    lab = np.zeros((20, 20), np.int64)
    lab[2:18, 2:18] = 1
    lab[6:14, 6:14] = 0  # carve a hole -> non-convex
    regions = regionprops(lab)
    assert regions[0].solidity < 1.0


def test_regionprops_3d_sphere():
    z, y, x = np.mgrid[0:16, 0:16, 0:16]
    lab = ((((z - 8) ** 2 + (y - 8) ** 2 + (x - 8) ** 2) <= 25)).astype(np.int64)
    regions = regionprops(lab, spacing=(1.0, 1.0, 1.0))
    r = regions[0]
    assert r.centroid == pytest.approx((8, 8, 8), abs=0.1)
    # sphere: axes approximately equal, close to diameter 2r=10
    assert r.major_axis_length == pytest.approx(r.minor_axis_length, rel=0.1)
    assert r.major_axis_length == pytest.approx(10.0, rel=0.15)
    assert r.solidity == pytest.approx(1.0, abs=0.05)


def test_convex_image_count_matches_scipy_delaunay(rng):
    """Our quickhull half-space convex image == scipy Delaunay membership
    (scipy used as test oracle only; the product path is scipy-free)."""
    from scipy.spatial import Delaunay

    from nellie_tpu.utils.convexhull import convex_image_count

    for ndim in (2, 3):
        for trial in range(6):
            pts = rng.integers(0, 14, (rng.integers(5, 40), ndim))
            pts = np.unique(pts, axis=0)
            if len(pts) < ndim + 2:
                continue
            try:
                hull = Delaunay(pts.astype(float))
            except Exception:
                assert convex_image_count(pts) is None
                continue
            mins, maxs = pts.min(0), pts.max(0)
            grid = np.stack([g.ravel() for g in np.meshgrid(
                *[np.arange(lo, hi + 1) for lo, hi in zip(mins, maxs)],
                indexing="ij")], axis=1)
            want = int((hull.find_simplex(grid.astype(float)) >= 0).sum())
            got = convex_image_count(pts)
            assert got == want, (ndim, trial, got, want)


def test_segment_nanstats_gathered_parity(rng):
    """Device-side gather variant == pre-gathered host/device path."""
    from nellie_tpu.kernels.segstats import (
        HOST_CUTOVER_N,
        segment_nanstats,
        segment_nanstats_gathered,
    )

    c, groups = 700, 9
    n = HOST_CUTOVER_N + 333  # force the device kernel
    values = rng.normal(3, 2, (4, c)).astype(np.float32)
    values[:, rng.random(c) < 0.1] = np.nan
    idx = rng.integers(0, c, n)
    seg = rng.integers(-1, groups, n).astype(np.int32)
    a = segment_nanstats_gathered(values, idx, seg, groups)
    b = segment_nanstats(values[:, idx], seg, groups)
    for key in a:
        np.testing.assert_allclose(a[key], b[key], rtol=2e-3, atol=1e-4,
                                   equal_nan=True, err_msg=key)

    # small-table fallback path
    a = segment_nanstats_gathered(values, idx[:500], seg[:500], groups)
    b = segment_nanstats(values[:, idx[:500]], seg[:500], groups)
    for key in a:
        np.testing.assert_allclose(a[key], b[key], rtol=1e-6,
                                   equal_nan=True, err_msg=key)


def test_node_device_aggregate_matches_host_oracle(rng):
    """The one-program device node aggregation (_node_agg_scan_kernel)
    == the dense numpy pair path (_host_aggregate) — the round-3
    mode-parity invariant for the node level."""
    from types import SimpleNamespace

    from nellie_tpu.stages.hierarchical import VOXEL_STATS, _NodeLevel

    m, c, d = 37, 900, 3
    nodes = rng.integers(0, 30, (m, d))
    coords = rng.integers(0, 30, (c, d))
    lo = np.clip(nodes - 3, 0, 30).astype(np.int32)
    hi = np.clip(nodes + 4, 0, 30).astype(np.int32)

    vox = SimpleNamespace()
    vox.coords = coords
    vox.vec01 = rng.normal(0, 1, (c, d)).astype(np.float32)
    vox.vec01[rng.random(c) < 0.3] = np.nan
    vox.vec12 = rng.normal(0, 1, (c, d)).astype(np.float32)
    vox.vec12[rng.random(c) < 0.2] = np.nan
    vox.stats = rng.normal(10, 3, (len(VOXEL_STATS), c)).astype(np.float32)
    vox.stats[0, rng.random(c) < 0.4] = np.nan

    h = SimpleNamespace(max_node_mask_elems=int(5e7), low_memory=False,
                        node_chunk_size=257)  # force multiple scan chunks

    nl = object.__new__(_NodeLevel)
    nl.nodes = nodes
    host = nl._host_aggregate(h, lo, hi, vox, m)
    dev = nl._device_aggregate(h, lo, hi, vox, m)
    for name, a, b in (("conv", host[0], dev[0]), ("div", host[1], dev[1]),
                       ("coords", host[2], dev[2])):
        np.testing.assert_allclose(np.asarray(a, float), np.asarray(b, float),
                                   rtol=2e-5, atol=1e-5, err_msg=name)
    for k in host[3]:
        np.testing.assert_allclose(np.asarray(host[3][k], float),
                                   np.asarray(dev[3][k], float),
                                   rtol=3e-5, atol=1e-4, err_msg=k)


@pytest.mark.parametrize("d", [2, 3])
def test_host_box_pairs_matches_dense_mask(rng, d):
    """_host_box_pairs (searchsorted range queries over argwhere-ordered
    coords) == the dense inclusive box mask, for sorted and unsorted
    coordinate order, 2D and 3D."""
    from nellie_tpu.stages.hierarchical import _host_box_pairs

    shape = (24,) * d
    vol = rng.random(shape) < 0.2
    coords = np.argwhere(vol)  # lexicographically sorted
    m = 50
    nodes = rng.integers(0, 24, (m, d))
    radius = rng.integers(0, 4, (m, 1))
    lo = np.clip(nodes - radius, 0, np.array(shape)).astype(np.int32)
    hi = np.clip(nodes + radius + 1, 0, np.array(shape)).astype(np.int32)

    def dense(cs):
        mask = np.logical_and.reduce(
            [(lo[:, None, k] <= cs[None, :, k]) & (cs[None, :, k] <= hi[:, None, k])
             for k in range(d)])
        return set(zip(*(a.tolist() for a in np.nonzero(mask))))

    pn, pv = _host_box_pairs(lo, hi, coords, shape)
    assert set(zip(pn.tolist(), pv.tolist())) == dense(coords)

    # unsorted coords exercise the argsort fallback
    perm = rng.permutation(len(coords))
    pn2, pv2 = _host_box_pairs(lo, hi, coords[perm], shape)
    assert set(zip(pn2.tolist(), pv2.tolist())) == dense(coords[perm])

    # empty inputs
    pn3, pv3 = _host_box_pairs(lo[:0], hi[:0], coords, shape)
    assert len(pn3) == 0 and len(pv3) == 0
    pn4, pv4 = _host_box_pairs(lo, hi, coords[:0], shape)
    assert len(pn4) == 0 and len(pv4) == 0
