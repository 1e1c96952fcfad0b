"""FlowInterpolator + VoxelReassigner tests."""
import numpy as np
import pytest

from nellie_tpu.io import ome as ome_mod
from nellie_tpu.io import tiff as tifffile
from nellie_tpu.io.verifier import FileInfo, ImInfo


def _setup_moving_blobs(tmp_path, n_t=3, shift=2):
    """Two blobs moving +shift in y per frame, with full artifacts."""
    shape = (n_t, 8, 32, 32)
    raw = np.zeros(shape, np.float32)
    labels = np.zeros(shape, np.int32)
    branch = np.zeros(shape, np.int32)
    marker = np.zeros(shape, np.uint8)
    z, y, x = np.mgrid[0:8, 0:32, 0:32]
    centers = [(8, 10), (20, 22)]
    for t in range(n_t):
        for i, (cy, cx) in enumerate(centers):
            cyt = cy + shift * t
            blob = (((z - 4) ** 2) / 2 + (y - cyt) ** 2 + (x - cx) ** 2) <= 6
            raw[t][blob] = 500
            labels[t][blob] = i + 1
            branch[t][blob] = i + 1  # one branch per object for simplicity
            marker[t, 4, cyt, cx] = 1
    # T res scales the interpolation radius (max_distance_um * dt); use 4s
    # so the 0.5 um/s default covers the whole blob around each marker
    desc = ome_mod.build_ome_xml("TZYX", shape, "uint16",
                                 dim_res={"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 4.0})
    path = tmp_path / "input.ome.tif"
    tifffile.imwrite(path, raw.astype(np.uint16), description=desc)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    im_info = ImInfo(fi)
    im_info.allocate_memory(im_info.pipeline_paths["im_preprocessed"], dtype="float",
                            data=(raw / 500).astype(np.float32), description="frangi")
    im_info.allocate_memory(im_info.pipeline_paths["im_instance_label"], dtype="int32",
                            data=labels, description="labels")
    im_info.allocate_memory(im_info.pipeline_paths["im_skel_relabelled"], dtype="uint32",
                            data=branch.astype(np.uint32), description="branches")
    im_info.allocate_memory(im_info.pipeline_paths["im_marker"], dtype="uint8",
                            data=marker, description="markers")
    im_info.allocate_memory(im_info.pipeline_paths["im_distance"], dtype="float32",
                            data=(labels > 0).astype(np.float32) * 2, description="distance")

    # exact flow vectors: one per marker per transition
    rows = []
    for t in range(n_t - 1):
        for cy, cx in centers:
            rows.append([t, 4, cy + shift * t, cx, 0, shift, 0, 0.1])
    flow = np.asarray(rows, np.float64)
    np.save(im_info.pipeline_paths["flow_vector_array"], flow)
    return im_info, labels, centers


def test_flow_interpolator_forward(tmp_path):
    im_info, labels, centers = _setup_moving_blobs(tmp_path)
    from nellie_tpu.stages.flow_interpolation import FlowInterpolator

    fi = FlowInterpolator(im_info, forward=True, max_distance_um=0.5)
    coords = np.asarray([[4.0, 8.0, 10.0], [4.0, 20.0, 22.0], [7.0, 0.0, 0.0]])
    vecs = fi.interpolate_coord(coords, 0)
    np.testing.assert_allclose(vecs[0], [0, 2, 0], atol=1e-4)
    np.testing.assert_allclose(vecs[1], [0, 2, 0], atol=1e-4)
    assert np.isnan(vecs[2]).all()  # far from any flow vector


def test_flow_interpolator_backward(tmp_path):
    im_info, labels, centers = _setup_moving_blobs(tmp_path)
    from nellie_tpu.stages.flow_interpolation import FlowInterpolator

    fi = FlowInterpolator(im_info, forward=False, max_distance_um=0.5)
    # at t=1, backward flow origin = origin + vector = positions at t=1
    coords = np.asarray([[4.0, 10.0, 10.0]])
    vecs = fi.interpolate_coord(coords, 1)
    np.testing.assert_allclose(vecs[0], [0, 2, 0], atol=1e-4)


def test_interpolate_all_forward_tracks(tmp_path):
    im_info, labels, centers = _setup_moving_blobs(tmp_path)
    from nellie_tpu.stages.flow_interpolation import interpolate_all_forward

    coords = np.asarray([[4.0, 8.0, 10.0]])
    tracks, props = interpolate_all_forward(coords, 0, 2, im_info, max_distance_um=0.5)
    tracks = np.asarray(tracks)
    assert tracks.shape[0] == 3  # t=0,1,2 positions
    np.testing.assert_allclose(tracks[:, 3], [8, 10, 12], atol=0.1)  # y moves +2


def test_voxel_reassigner_propagates_labels(tmp_path):
    im_info, labels, centers = _setup_moving_blobs(tmp_path)
    from nellie_tpu.stages.voxel_reassignment import VoxelReassigner

    VoxelReassigner(im_info).run()
    reassigned = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_obj_label_reassigned"]))
    assert reassigned.dtype == np.int32
    # t=0 copied
    np.testing.assert_array_equal(reassigned[0], labels[0])
    # blob identity follows the motion: at t=2, blob around y=12 is label 1
    for t in range(3):
        blob1 = labels[t] == 1
        blob2 = labels[t] == 2
        vals1 = reassigned[t][blob1]
        vals2 = reassigned[t][blob2]
        assert (vals1 == 1).mean() > 0.9, f"t={t}"
        assert (vals2 == 2).mean() > 0.9, f"t={t}"
    # voxel_matches.npy saved
    matches = np.load(im_info.pipeline_paths["voxel_matches"], allow_pickle=True)
    assert len(matches) == 2  # two transitions
    prev, nxt = matches[0]
    assert prev.shape == nxt.shape and prev.shape[1] == 3


def test_voxel_reassigner_fused_matches_host_path(tmp_path):
    """Mode parity: the default fused device pair pipeline and the
    step-by-step host path (the low_memory rung / mesh-window path) must
    produce the same artifacts.  Distances are f32 on device vs f64 host
    intermediates, so a tiny near-tie budget is allowed on the labels."""
    from nellie_tpu.stages.voxel_reassignment import VoxelReassigner

    (tmp_path / "fused").mkdir()
    (tmp_path / "host").mkdir()
    im_fused, _, _ = _setup_moving_blobs(tmp_path / "fused")
    VoxelReassigner(im_fused).run()
    im_host, _, _ = _setup_moving_blobs(tmp_path / "host")
    VoxelReassigner(im_host, low_memory=True).run()

    for key in ("im_obj_label_reassigned", "im_branch_label_reassigned"):
        a = np.asarray(im_fused.get_memmap(im_fused.pipeline_paths[key]))
        b = np.asarray(im_host.get_memmap(im_host.pipeline_paths[key]))
        mismatch = (a != b).mean()
        assert mismatch <= 1e-3, f"{key}: {mismatch:.5f} mismatch"

    ma = np.load(im_fused.pipeline_paths["voxel_matches"], allow_pickle=True)
    mb = np.load(im_host.pipeline_paths["voxel_matches"], allow_pickle=True)
    assert len(ma) == len(mb)
    for (pa, na), (pb, nb) in zip(ma, mb):
        np.testing.assert_array_equal(na, nb)
        np.testing.assert_array_equal(pa, pb)


def test_assign_unique_matches_one_to_one():
    from nellie_tpu.stages.voxel_reassignment import VoxelReassigner

    vr = VoxelReassigner.__new__(VoxelReassigner)
    vr.spatial_shape = (10, 10, 10)
    prev = np.asarray([[1, 1, 1], [1, 1, 1], [2, 2, 2]])
    nxt = np.asarray([[3, 3, 3], [4, 4, 4], [3, 3, 3]])
    dist = np.asarray([0.5, 0.2, 0.1])
    p, n = vr._assign_unique_matches(prev, nxt, dist)
    # greedy by distance: (2,2,2)->(3,3,3) first, then (1,1,1)->(4,4,4)
    assert len(p) == 2
    pairs = {(tuple(a), tuple(b)) for a, b in zip(p, n)}
    assert ((2, 2, 2), (3, 3, 3)) in pairs
    assert ((1, 1, 1), (4, 4, 4)) in pairs


def test_device_voting_matches_host_lexsort(rng):
    """The jitted sort+segment-sum voting must reproduce the host
    lexsort/reduceat path exactly, including tie-breaks."""
    from types import SimpleNamespace

    from nellie_tpu.kernels.voting import vote_targets
    from nellie_tpu.stages.voxel_reassignment import VoxelReassigner

    shape = (8, 64, 64)
    n = 5000
    coords = np.column_stack([rng.integers(0, s, n) for s in shape])
    labels = rng.integers(1, 40, n).astype(np.int32)
    dists = rng.uniform(0.1, 5.0, n)

    vr = VoxelReassigner.__new__(VoxelReassigner)
    vr.spatial_shape = shape
    # host reference: raise the cutover so the numpy lexsort path runs
    vr.DEVICE_VOTE_CUTOVER = 10**9
    host = vr._vote_targets(coords, labels, dists)

    flat = np.ravel_multi_index(coords.T, shape)
    dev = vote_targets(flat, labels, dists)

    np.testing.assert_array_equal(dev[0], host[0])  # targets
    np.testing.assert_array_equal(dev[1], host[1])  # winning labels
    np.testing.assert_array_equal(dev[2], host[2])  # representative idx


def test_device_voting_duplicate_pairs(rng):
    """Weight accumulation across duplicate (target, label) rows."""
    from nellie_tpu.kernels.voting import vote_targets

    # one target, label 1 twice with weight ~1 each, label 2 once with
    # weight ~1.9 -> label 1 wins on the summed weight
    flat = np.array([7, 7, 7], np.int64)
    labels = np.array([1, 1, 2], np.int32)
    dists = np.array([1.0, 1.0, 1.0 / 1.9 - 1e-6])
    tgts, lbls, idxs = vote_targets(flat, labels, dists)
    assert list(tgts) == [7]
    assert list(lbls) == [1]
    assert idxs[0] in (0, 1)
