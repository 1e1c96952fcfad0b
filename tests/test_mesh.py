"""Sharding tests on the 8-device virtual CPU mesh: sharded == single-chip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nellie_tpu.kernels import frangi as frangi_k
from nellie_tpu.mesh import make_mesh, sharded_segment_step, sharded_vesselness


def _tube(shape=(16, 32, 32), seed=0):
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0 : shape[0], 0 : shape[1], 0 : shape[2]]
    tube = 800.0 * np.exp(-(((z - 8) ** 2) * 0.3 + (y - 16 + 4 * np.sin(x / 6.0)) ** 2 / 2) / (2 * 2.0**2))
    return np.clip(tube + rng.normal(100, 5, shape), 0, None).astype(np.float32)


PARAMS = frangi_k.FrangiParams(sigmas=(0.75, 0.95), spacing=(0.5, 0.2, 0.2), z_ratio=2.5)


def test_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_vesselness_matches_single_device():
    frame = _tube()
    single, _ = frangi_k.vesselness_frame(jnp.asarray(frame), PARAMS)
    mesh = make_mesh(8, t_axis=1)
    sharded = sharded_vesselness(frame, PARAMS, mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_sharded_segment_step_batch():
    batch = np.stack([_tube(seed=i) for i in range(2)])
    mesh = make_mesh(8, t_axis=2)
    vessel, labels, counts = sharded_segment_step(batch, PARAMS, mesh)
    vessel = np.asarray(vessel)
    labels = np.asarray(labels)
    assert vessel.shape == batch.shape
    assert labels.shape == batch.shape
    assert (labels > 0).any()
    # frames are near-identical content; label counts should match
    assert int(counts[0]) >= 1 and int(counts[1]) >= 1


@pytest.mark.slow
def test_filter_label_stages_with_mesh(tmp_path):
    """run(mesh=...) shards the Filter/Label frame kernels over an
    8-device mesh and produces artifacts identical to single-device."""
    from tests.test_pipeline import _make_input
    from nellie_tpu.io.verifier import ImInfo
    from nellie_tpu.stages.filtering import Filter
    from nellie_tpu.stages.labelling import Label

    def _segment(out_dir, mesh):
        sub = tmp_path / out_dir
        sub.mkdir()
        fi = _make_input(sub, n_t=1)
        im_info = ImInfo(fi)
        Filter(im_info, mesh=mesh).run()
        Label(im_info, mesh=mesh).run()
        frangi = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_preprocessed"]))
        labels = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_instance_label"]))
        return frangi, labels

    f_single, l_single = _segment("single", None)
    f_mesh, l_mesh = _segment("meshed", make_mesh(8, t_axis=1))
    # sharded reductions reassociate floats -> tiny (~1e-6) frangi drift
    np.testing.assert_allclose(f_single, f_mesh, atol=1e-5, rtol=1e-3)
    fg_s, fg_m = l_single > 0, l_mesh > 0
    iou = (fg_s & fg_m).sum() / max(1, (fg_s | fg_m).sum())
    assert iou > 0.999
    assert l_single.max() == l_mesh.max()  # same component count


@pytest.mark.slow
def test_mesh_t_batched_frames_match_sequential(tmp_path):
    """run(mesh=<t=4 x z=2>) feeds frame groups to the mesh 't' axis; the
    Filter/Label artifacts must match the sequential per-frame path."""
    from tests.test_pipeline import _make_input
    from nellie_tpu.io.verifier import ImInfo
    from nellie_tpu.stages.filtering import Filter
    from nellie_tpu.stages.labelling import Label

    def _segment(out_dir, mesh):
        sub = tmp_path / out_dir
        sub.mkdir()
        fi = _make_input(sub, n_t=4)
        im_info = ImInfo(fi)
        Filter(im_info, mesh=mesh).run()
        Label(im_info, mesh=mesh).run()
        frangi = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_preprocessed"]))
        labels = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_instance_label"]))
        return frangi, labels

    f_seq, l_seq = _segment("seq", None)
    f_bat, l_bat = _segment("bat", make_mesh(8, t_axis=4))
    np.testing.assert_allclose(f_seq, f_bat, atol=1e-5, rtol=1e-3)
    np.testing.assert_array_equal(l_seq, l_bat)


@pytest.mark.slow
def test_multi_file_batch_matches_sequential(tmp_path):
    """pipeline.batch.run_files with a t=4 mesh (files over 't') produces
    the same artifacts as sequential run() per file."""
    from tests.test_pipeline import _make_input
    from nellie_tpu.io.verifier import ImInfo
    from nellie_tpu.pipeline.batch import run_files
    from nellie_tpu.pipeline.run import run

    seq_dir = tmp_path / "seq"
    bat_dir = tmp_path / "bat"
    seq_dir.mkdir()
    bat_dir.mkdir()
    seq_infos, bat_fis = [], []
    for k in range(3):
        s = seq_dir / f"f{k}"
        b = bat_dir / f"f{k}"
        s.mkdir()
        b.mkdir()
        seq_infos.append(run(_make_input(s, n_t=2, seed=k)))
        bat_fis.append(_make_input(b, n_t=2, seed=k))

    bat_infos = run_files(bat_fis, mesh=make_mesh(8, t_axis=4))
    for s_im, b_im in zip(seq_infos, bat_infos):
        # all four batched stages' artifacts (Filter/Label/Network/Markers)
        for key in ("im_preprocessed", "im_instance_label", "im_skel",
                    "im_pixel_class", "im_skel_relabelled", "im_marker",
                    "im_distance", "im_border"):
            a = np.asarray(s_im.get_memmap(s_im.pipeline_paths[key]))
            b = np.asarray(b_im.get_memmap(b_im.pipeline_paths[key]))
            if key == "im_preprocessed":
                np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-3, err_msg=key)
            elif key == "im_distance":
                np.testing.assert_allclose(a, b, atol=1e-4, err_msg=key)
            else:
                np.testing.assert_array_equal(a, b, err_msg=key)
        # stages 5-7 run file-parallel over the mesh devices; results
        # must match the sequential per-file loop exactly
        fa = np.load(s_im.pipeline_paths["flow_vector_array"])
        fb = np.load(b_im.pipeline_paths["flow_vector_array"])
        np.testing.assert_allclose(fa, fb, atol=1e-5, err_msg="flow_vector_array")
        for key in ("im_obj_label_reassigned", "im_branch_label_reassigned"):
            a = np.asarray(s_im.get_memmap(s_im.pipeline_paths[key]))
            b = np.asarray(b_im.get_memmap(b_im.pipeline_paths[key]))
            np.testing.assert_array_equal(a, b, err_msg=key)
        import pandas as pd
        for key in ("features_branches", "features_organelles"):
            da = pd.read_csv(s_im.pipeline_paths[key])
            db = pd.read_csv(b_im.pipeline_paths[key])
            assert list(da.columns) == list(db.columns), key
            np.testing.assert_allclose(
                da.to_numpy(float), db.to_numpy(float),
                rtol=1e-5, atol=1e-6, equal_nan=True, err_msg=key)


@pytest.mark.slow
def test_tracking_mesh_matches_sequential(tmp_path):
    """HuMomentTracking(mesh=...) runs frame features and pair matching
    device-parallel; flow_vector_array must equal the sequential loop."""
    from tests.test_pipeline import _make_input
    from nellie_tpu.io.verifier import ImInfo
    from nellie_tpu.pipeline.fused import FusedSegmentation
    from nellie_tpu.stages.hu_tracking import HuMomentTracking

    def _track(out_dir, mesh):
        sub = tmp_path / out_dir
        sub.mkdir()
        fi = _make_input(sub, n_t=4)
        im_info = ImInfo(fi)
        FusedSegmentation(im_info).run()
        HuMomentTracking(im_info, mesh=mesh).run()
        return np.load(im_info.pipeline_paths["flow_vector_array"])

    seq = _track("seq", None)
    par = _track("par", make_mesh(8, t_axis=8))
    assert seq.shape[0] > 0  # the tubes drift: matches must exist
    np.testing.assert_allclose(seq, par, atol=1e-5, err_msg="flow_vector_array")


@pytest.mark.slow
def test_reassign_mesh_matches_sequential(tmp_path):
    """VoxelReassigner(mesh=...) computes the per-pair NN/flow candidates
    device-parallel; reassigned labels and voxel matches must equal the
    sequential loop (voting itself stays t-sequential in both)."""
    from tests.test_pipeline import _make_input
    from nellie_tpu.io.verifier import ImInfo
    from nellie_tpu.pipeline.fused import FusedSegmentation
    from nellie_tpu.stages.hu_tracking import HuMomentTracking
    from nellie_tpu.stages.voxel_reassignment import VoxelReassigner

    fi = _make_input(tmp_path, n_t=4)
    im_info = ImInfo(fi)
    FusedSegmentation(im_info).run()
    HuMomentTracking(im_info).run()

    def run_reassign(mesh):
        VoxelReassigner(im_info, mesh=mesh).run()
        pp = im_info.pipeline_paths
        return (
            np.asarray(im_info.get_memmap(pp["im_obj_label_reassigned"])).copy(),
            np.asarray(im_info.get_memmap(pp["im_branch_label_reassigned"])).copy(),
            np.load(pp["voxel_matches"], allow_pickle=True),
        )

    obj_s, br_s, vm_s = run_reassign(None)
    obj_p, br_p, vm_p = run_reassign(make_mesh(8, t_axis=8))
    assert obj_s[1:].max() > 0  # labels actually propagated
    np.testing.assert_array_equal(obj_s, obj_p)
    np.testing.assert_array_equal(br_s, br_p)
    assert len(vm_s) == len(vm_p)
    for a, b in zip(vm_s, vm_p):
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


@pytest.mark.slow
def test_hierarchy_mesh_matches_sequential(tmp_path):
    """Hierarchy(mesh=...) widens the frame pipeline over the mesh's
    devices; every feature CSV must match the sequential (2-wide) loop."""
    import pandas as pd

    from tests.test_pipeline import _make_input
    from nellie_tpu.io.verifier import ImInfo
    from nellie_tpu.pipeline.fused import FusedSegmentation
    from nellie_tpu.stages.hierarchical import Hierarchy
    from nellie_tpu.stages.hu_tracking import HuMomentTracking
    from nellie_tpu.stages.voxel_reassignment import VoxelReassigner

    fi = _make_input(tmp_path, n_t=4)
    im_info = ImInfo(fi)
    FusedSegmentation(im_info).run()
    HuMomentTracking(im_info).run()
    VoxelReassigner(im_info).run()

    keys = ("features_voxels", "features_nodes", "features_branches",
            "features_organelles", "features_image")

    def run_hier(mesh):
        Hierarchy(im_info, skip_nodes=False, mesh=mesh).run()
        return {k: pd.read_csv(im_info.pipeline_paths[k]) for k in keys}

    seq = run_hier(None)
    par = run_hier(make_mesh(8, t_axis=8))
    for k in keys:
        assert list(seq[k].columns) == list(par[k].columns), k
        assert len(seq[k]) > 0, k
        np.testing.assert_allclose(
            seq[k].to_numpy(float), par[k].to_numpy(float),
            rtol=1e-5, atol=1e-6, equal_nan=True, err_msg=k)


def test_cli_parse_mesh():
    from nellie_tpu.pipeline.cli import parse_mesh

    assert parse_mesh(None) is None
    m = parse_mesh("8")
    assert m.shape["t"] == 8 and m.shape["z"] == 1
    m = parse_mesh("2x4")
    assert m.shape["t"] == 2 and m.shape["z"] == 4


def test_make_hybrid_mesh_fallback():
    """On single-slice / CPU backends the hybrid constructor must fall
    back to the flat (t, z) mesh (DCN policy only applies multi-slice)."""
    from nellie_tpu.mesh import make_hybrid_mesh, make_mesh

    m = make_hybrid_mesh(t_axis=2)
    flat = make_mesh(t_axis=2)
    assert m.axis_names == ("t", "z")
    assert m.devices.size == flat.devices.size


@pytest.mark.slow
def test_multi_file_batch_single_timepoint_files(tmp_path):
    """BASELINE config #5 shape: a folder of single-timepoint ZYX files
    batched across the mesh 't' axis (regression: the canonical artifact
    is T-first even for no_t files, so the batched Filter must index
    [t], not stack the 4D memmap)."""
    from nellie_tpu.io import ome as ome_mod
    from nellie_tpu.io import tiff as tifffile
    from nellie_tpu.io.verifier import FileInfo
    from nellie_tpu.pipeline.batch import run_files
    from nellie_tpu.pipeline.run import run

    def one_file(d, seed):
        shape = (12, 48, 48)
        rng = np.random.default_rng(seed)
        z, y, x = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
        tube = 900.0 * np.exp(
            -(((z - 6) ** 2) * 0.25 + (y - 24 + 6 * np.sin(x / 9.0)) ** 2 / 2)
            / (2 * 2.2**2))
        data = np.clip(tube + rng.normal(100, 5, shape), 0, None).astype(np.uint16)
        desc = ome_mod.build_ome_xml(
            "ZYX", shape, "uint16", dim_res={"X": 0.2, "Y": 0.2, "Z": 0.5})
        path = d / "cells.ome.tif"
        tifffile.imwrite(path, data, description=desc)
        fi = FileInfo(str(path))
        fi.find_metadata()
        fi.load_metadata()
        return fi

    seq_dir, bat_dir = tmp_path / "seq", tmp_path / "bat"
    seq_infos, bat_fis = [], []
    for k in range(2):
        s, b = seq_dir / f"f{k}", bat_dir / f"f{k}"
        s.mkdir(parents=True)
        b.mkdir(parents=True)
        seq_infos.append(run(one_file(s, k)))
        bat_fis.append(one_file(b, k))

    bat_infos = run_files(bat_fis, mesh=make_mesh(8, t_axis=2))
    for s_im, b_im in zip(seq_infos, bat_infos):
        a = np.asarray(s_im.get_memmap(s_im.pipeline_paths["im_preprocessed"]))
        b = np.asarray(b_im.get_memmap(b_im.pipeline_paths["im_preprocessed"]))
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-3)
        a = np.asarray(s_im.get_memmap(s_im.pipeline_paths["im_instance_label"]))
        b = np.asarray(b_im.get_memmap(b_im.pipeline_paths["im_instance_label"]))
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_fused_mesh_shards_four_stages(tmp_path):
    """run(..., mesh=) routes the fused Filter/Label/Network/Markers loop
    through a GSPMD NamedSharding — the sharded artifacts of all FOUR
    segmentation stages must match single-device execution (labels and
    class images exactly; vesselness to float-reassociation tolerance)."""
    from tests.test_pipeline import _make_input
    from nellie_tpu.io.verifier import ImInfo
    from nellie_tpu.pipeline.fused import FusedSegmentation

    def _run(out_dir, mesh):
        sub = tmp_path / out_dir
        sub.mkdir()
        fi = _make_input(sub, n_t=2)
        im_info = ImInfo(fi)
        FusedSegmentation(im_info, mesh=mesh).run()
        pp = im_info.pipeline_paths
        return {k: np.asarray(im_info.get_memmap(pp[k]))
                for k in ("im_preprocessed", "im_instance_label", "im_skel",
                          "im_pixel_class", "im_skel_relabelled", "im_marker",
                          "im_distance", "im_border")}

    single = _run("single", None)
    sharded = _run("sharded", make_mesh(8, t_axis=1))  # z=8 spatial shards

    np.testing.assert_allclose(sharded["im_preprocessed"], single["im_preprocessed"],
                               atol=1e-5, rtol=1e-3)
    # sharded float reductions reassociate -> threshold bins can shift a
    # boundary voxel; compare discrete artifacts structurally (same
    # pattern as test_filter_label_stages_with_mesh)
    for key in ("im_instance_label", "im_skel", "im_pixel_class",
                "im_skel_relabelled", "im_marker", "im_border"):
        fg_s = single[key] > 0
        fg_m = sharded[key] > 0
        iou = (fg_s & fg_m).sum() / max(1, (fg_s | fg_m).sum())
        assert iou > 0.99, f"{key}: IoU {iou}"
    assert sharded["im_instance_label"].max() == single["im_instance_label"].max()
    both = (single["im_instance_label"] > 0) & (sharded["im_instance_label"] > 0)
    np.testing.assert_allclose(sharded["im_distance"][both],
                               single["im_distance"][both], atol=1e-3)
