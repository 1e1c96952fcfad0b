"""Per-stage artifact parity against the reference-algorithm oracles.

Every pipeline artifact gets a cross-implementation check with an
explicit tolerance (see tests/oracle/algos.py docstring for the policy
table) — these replace self-recorded goldens as the correctness anchor,
mirroring the reference's canonical smoke test
(``/root/reference/nellie/run.py:163-212``).
"""
import numpy as np
import pytest
import scipy.ndimage as ndi

from tests.oracle import algos
# compile-heavy: runs in the CI tests-slow job, not the fast path
pytestmark = pytest.mark.slow



def _tube_frame(shape=(12, 48, 48), seed=0, amp=900.0):
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
    tube = amp * np.exp(
        -(((z - shape[0] // 2) ** 2) * 0.25
          + (y - shape[1] // 2 + 6 * np.sin(x / 9.0)) ** 2 / 2) / (2 * 2.2 ** 2))
    return np.clip(tube + rng.normal(100, 5, shape), 0, None).astype(np.float32)


SIGMAS = (0.625, 0.8333333333333334, 1.0416666666666667, 1.25, 1.4583333333333335)
SPACING = (0.5, 0.2, 0.2)
Z_RATIO = 2.5


@pytest.fixture(scope="module")
def frame():
    return _tube_frame()


@pytest.fixture(scope="module")
def ours(frame):
    import jax.numpy as jnp

    from nellie_tpu.kernels import frangi as frangi_k
    from nellie_tpu.mesh.sharded import _segment_step

    params = frangi_k.FrangiParams(sigmas=SIGMAS, spacing=SPACING, z_ratio=Z_RATIO)
    vessel, labels, n = _segment_step(jnp.asarray(frame), params, 4)
    return np.asarray(vessel), np.asarray(labels), int(n)


@pytest.fixture(scope="module")
def oracle(frame):
    vessel = algos.frangi_reference(frame, SIGMAS, SPACING, Z_RATIO)
    labels = algos.label_reference(vessel, 4)
    return vessel, labels


def test_filter_artifact_parity(ours, oracle):
    v_ours, _, _ = ours
    v_ref, _ = oracle
    fg_o, fg_r = v_ours > 0, v_ref > 0
    iou = (fg_o & fg_r).sum() / max(1, (fg_o | fg_r).sum())
    assert iou > 0.95, f"frangi fg IoU {iou:.3f}"
    both = fg_o & fg_r
    corr = np.corrcoef(v_ours[both], v_ref[both])[0, 1]
    assert corr > 0.98, f"frangi correlation {corr:.3f}"


def test_label_artifact_parity(ours, oracle):
    _, l_ours, n_ours = ours
    _, l_ref = oracle
    assert n_ours == l_ref.max(), (n_ours, l_ref.max())
    fg_o, fg_r = l_ours > 0, l_ref > 0
    iou = (fg_o & fg_r).sum() / max(1, (fg_o | fg_r).sum())
    assert iou > 0.98, f"label fg IoU {iou:.3f}"


def test_skeleton_topology_and_completeness(ours):
    """Thinning-order differences are allowed; topology and completeness
    are not: per-object component preservation, skeleton within mask, and
    no deletable simple points remaining (independent scipy-based test)."""
    import jax.numpy as jnp

    from nellie_tpu.kernels.skeleton import skeletonize_3d

    _, labels, _ = ours
    mask = labels > 0
    skel = np.asarray(skeletonize_3d(jnp.asarray(mask)))
    assert (skel & ~mask).sum() == 0, "skeleton outside mask"
    s_in = np.ones((3, 3, 3))
    n_mask = ndi.label(mask, structure=s_in)[1]
    n_skel = ndi.label(skel, structure=s_in)[1]
    assert n_mask == n_skel, f"components {n_mask} -> {n_skel}"
    remaining = algos.count_remaining_simple_points(skel)
    assert remaining == 0, f"{remaining} deletable simple points remain"


def test_pixel_class_parity(ours):
    import jax.numpy as jnp

    from nellie_tpu.stages.networking import _pixel_class_kernel

    _, labels, _ = ours
    from nellie_tpu.kernels.skeleton import skeletonize_3d

    skel = np.where(np.asarray(skeletonize_3d(jnp.asarray(labels > 0))), labels, 0)
    ours_pc = np.asarray(_pixel_class_kernel(jnp.asarray(skel)))
    ref_pc = algos.pixel_class_reference(skel)
    np.testing.assert_array_equal(ours_pc, ref_pc)


def test_distance_border_parity(ours):
    import jax.numpy as jnp

    from nellie_tpu.kernels import edt
    from nellie_tpu.kernels.filters import binary_dilation

    _, labels, _ = ours
    mask = labels > 0
    clamp = 11
    d_ours = np.asarray(edt.distance_transform(jnp.asarray(mask), max_radius_px=clamp))
    d_ours = np.minimum(d_ours, clamp)
    d_ref = algos.distance_reference(mask, clamp=clamp)
    np.testing.assert_allclose(d_ours, d_ref, atol=1e-3)

    b_ours = np.asarray(binary_dilation(jnp.asarray(mask), connectivity=1) ^ jnp.asarray(mask))
    np.testing.assert_array_equal(b_ours.astype(np.uint8), algos.border_reference(mask))


def test_dense_matching_flow_rows_parity(rng):
    """The full matching semantics (z-score + mutual argmin + cutoff)
    against the independent numpy oracle — exact match-set equality."""
    from nellie_tpu.kernels.matching import match_frames

    n0, n1, n_stats, n_hu = 40, 37, 4, 18
    coords0 = rng.uniform(0, 20, (n0, 3)).astype(np.float32)
    # frame 1: mostly-moved copies of frame 0 + extras
    coords1 = np.concatenate([
        coords0[:30] + rng.normal(0, 0.2, (30, 3)),
        rng.uniform(0, 20, (n1 - 30, 3)),
    ]).astype(np.float32)
    stats0 = rng.normal(0, 1, (n0, n_stats)).astype(np.float32)
    stats1 = np.concatenate([stats0[:30] + rng.normal(0, 0.05, (30, n_stats)),
                             rng.normal(0, 1, (n1 - 30, n_stats))]).astype(np.float32)
    hu0 = rng.normal(0, 1, (n0, n_hu)).astype(np.float32)
    hu1 = np.concatenate([hu0[:30] + rng.normal(0, 0.05, (30, n_hu)),
                          rng.normal(0, 1, (n1 - 30, n_hu))]).astype(np.float32)
    max_d = 3.0

    rows, cols, costs = match_frames(coords1, coords0, stats1, stats0, hu1, hu0, max_d)
    ours = sorted(set(zip(map(int, rows), map(int, cols))))

    feats1 = np.concatenate([stats1, hu1], axis=1)
    feats0 = np.concatenate([stats0, hu0], axis=1)
    ref = algos.dense_match_reference(coords1, coords0, feats1, feats0, max_d, n_stats)
    assert ours == ref


def test_flow_interp_parity(tmp_path, rng):
    """FlowInterpolator weighting vs the independent oracle."""
    from nellie_tpu.stages.flow_interpolation import FlowInterpolator

    d = 3
    m = 25
    flow_coords = rng.uniform(0, 30, (m, d))
    flow_vecs = rng.normal(0, 1, (m, d)).astype(np.float32)
    flow_costs = rng.uniform(0, 0.9, m).astype(np.float32)
    rows = np.column_stack([np.zeros(m), flow_coords, flow_vecs, flow_costs])

    class FakeInfo:
        no_t = False
        no_z = False
        axes = "TZYX"
        shape = (2, 32, 32, 32)
        dim_res = {"T": 1.0, "Z": 0.5, "Y": 0.2, "X": 0.2}
        pipeline_paths = {}
        im_path = None

    fi = FlowInterpolator.__new__(FlowInterpolator)
    fi.im_info = FakeInfo()
    fi.num_t = 2
    fi.scaling = (0.5, 0.2, 0.2)
    fi.max_distance_um = 1.0
    fi.forward = True
    fi.shape = FakeInfo.shape
    fi.flow_vector_array = rows
    fi.current_t = None

    coords = rng.uniform(0, 30, (50, d))
    ours = fi.interpolate_coord(coords, 0)
    ref = algos.flow_interp_reference(
        coords, flow_coords, flow_vecs, flow_costs,
        np.asarray(fi.scaling), fi.max_distance_um)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4, equal_nan=True)


def test_branch_length_parity(rng):
    from nellie_tpu.kernels.segstats import branch_geometry

    skel = np.zeros((10, 20, 20), np.int32)
    skel[5, 10, 2:18] = 1
    for i in range(8):
        skel[5, 2 + i, 2 + i] = 2
    skel[(rng.random((10, 20, 20)) < 0.02) & (skel == 0)] = 3
    spacing = (0.5, 0.2, 0.2)
    ours, _ = branch_geometry(skel, spacing)
    ref = algos.branch_length_reference(skel, spacing)
    np.testing.assert_allclose(ours, ref[: len(ours)], rtol=1e-5, atol=1e-6)
