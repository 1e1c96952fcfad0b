"""Hierarchy feature extraction tests: aggregation parity + regionprops."""
import numpy as np
import pytest

from nellie_tpu.stages.hierarchical import aggregate_stats_for_class
from nellie_tpu.utils.regionprops import regionprops


class FakeLevel:
    def __init__(self, values, t=0):
        self.stats_to_aggregate = ["intensity", "structure"]
        self.intensity = [np.asarray(values)]
        self.structure = [np.asarray(values) * 2 + 1]


def test_low_memory_vs_vectorized_aggregation_parity(rng):
    """The reference's key invariant (test_hierarchical_aggregation.py)."""
    values = rng.normal(5, 2, 200).astype(np.float32)
    values[rng.random(200) < 0.1] = np.nan
    level = FakeLevel(values)
    groups = [
        np.arange(0, 50), np.arange(50, 53), np.array([], int),
        np.arange(53, 200), np.array([7]),
    ]
    fast = aggregate_stats_for_class(level, 0, groups, low_memory=False)
    slow = aggregate_stats_for_class(level, 0, groups, low_memory=True)
    for stat in fast:
        for key in fast[stat]:
            np.testing.assert_allclose(
                np.asarray(fast[stat][key], float).ravel(),
                np.asarray(slow[stat][key], float).ravel(),
                rtol=1e-6, equal_nan=True,
                err_msg=f"{stat}/{key}",
            )


def test_aggregation_values(rng):
    values = np.asarray([1.0, 2.0, 3.0, np.nan, 10.0])
    level = FakeLevel(values)
    agg = aggregate_stats_for_class(level, 0, [np.array([0, 1, 2, 3])], low_memory=False)
    assert agg["intensity"]["mean"][0][0] == pytest.approx(2.0)
    assert agg["intensity"]["sum"][0][0] == pytest.approx(6.0)
    assert agg["intensity"]["min"][0][0] == pytest.approx(1.0)
    assert agg["intensity"]["max"][0][0] == pytest.approx(3.0)


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
