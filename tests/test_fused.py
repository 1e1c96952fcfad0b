"""Fused device-resident segmentation == classic per-stage path.

The fused loop (``pipeline/fused.py``) runs the SAME jitted kernels as
the standalone stage classes, so every stage-1..4 artifact must be
bit-identical between the two paths (the mode-parity pattern of
SURVEY.md §4, applied at the orchestration level)."""
import numpy as np
import pytest

from nellie_tpu.io import ome as ome_mod
from nellie_tpu.io import tiff as tifffile
from nellie_tpu.io.verifier import FileInfo, ImInfo


def _make_input(tmp_path, name, n_t=2, shape_zyx=(12, 48, 48), seed=0, no_z=False):
    rng = np.random.default_rng(seed)
    if no_z:
        y, x = np.mgrid[0:shape_zyx[-2], 0:shape_zyx[-1]]
        frames = [
            np.clip(700 * np.exp(-((y - 24 - t + 5 * np.sin(x / 8.0)) ** 2) / (2 * 2.0**2))
                    + rng.normal(80, 5, shape_zyx[-2:]), 0, None)
            for t in range(n_t)
        ]
        axes = "TYX"
        dim_res = {"X": 0.1, "Y": 0.1, "Z": None, "T": 2.0}
    else:
        z, y, x = np.mgrid[0:shape_zyx[0], 0:shape_zyx[1], 0:shape_zyx[2]]
        frames = [
            np.clip(900.0 * np.exp(
                -(((z - 6) ** 2) * 0.25 + (y - 24 - t + 6 * np.sin(x / 9.0)) ** 2 / 2)
                / (2 * 2.2**2)) + rng.normal(100, 5, shape_zyx), 0, None)
            for t in range(n_t)
        ]
        axes = "TZYX"
        dim_res = {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 2.0}
    data = np.stack(frames).astype(np.uint16)
    desc = ome_mod.build_ome_xml(axes, data.shape, "uint16", dim_res=dim_res)
    path = tmp_path / f"{name}.ome.tif"
    tifffile.imwrite(path, data, description=desc)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    return fi


STAGE14_ARTIFACTS = ("im_preprocessed", "im_instance_label", "im_skel",
                     "im_pixel_class", "im_skel_relabelled", "im_marker",
                     "im_distance", "im_border")


def _run_both(tmp_path, no_z=False, **kwargs):
    from nellie_tpu.pipeline.fused import FusedSegmentation
    from nellie_tpu.stages.filtering import Filter
    from nellie_tpu.stages.labelling import Label
    from nellie_tpu.stages.mocap_marking import Markers
    from nellie_tpu.stages.networking import Network

    (tmp_path / "a").mkdir(exist_ok=True)
    (tmp_path / "b").mkdir(exist_ok=True)
    fi_a = _make_input(tmp_path / "a", "cells", no_z=no_z)
    fi_b = _make_input(tmp_path / "b", "cells", no_z=no_z)
    im_a = ImInfo(fi_a)
    im_b = ImInfo(fi_b)

    Filter(im_a, remove_edges=kwargs.get("remove_edges", False)).run()
    Label(im_a, otsu_thresh_intensity=kwargs.get("otsu_thresh_intensity", False),
          threshold=kwargs.get("threshold")).run()
    Network(im_a).run()
    Markers(im_a).run()

    FusedSegmentation(im_b, **kwargs).run()
    return im_a, im_b


def _assert_artifacts_equal(im_a, im_b):
    for key in STAGE14_ARTIFACTS:
        a = np.asarray(im_a.get_memmap(im_a.pipeline_paths[key]))
        b = np.asarray(im_b.get_memmap(im_b.pipeline_paths[key]))
        np.testing.assert_array_equal(a, b, err_msg=key)


@pytest.mark.slow
def test_fused_matches_per_stage_3d(tmp_path):
    im_a, im_b = _run_both(tmp_path)
    _assert_artifacts_equal(im_a, im_b)
    labels = np.asarray(im_b.get_memmap(im_b.pipeline_paths["im_instance_label"]))
    assert (labels > 0).any()


@pytest.mark.slow
def test_fused_matches_per_stage_2d(tmp_path):
    im_a, im_b = _run_both(tmp_path, no_z=True)
    _assert_artifacts_equal(im_a, im_b)


@pytest.mark.slow
def test_fused_matches_per_stage_otsu_and_edges(tmp_path):
    im_a, im_b = _run_both(tmp_path, otsu_thresh_intensity=True, remove_edges=True)
    _assert_artifacts_equal(im_a, im_b)


@pytest.mark.slow
def test_fused_batched_groups_match_per_frame(tmp_path):
    """Single-dispatch frame-group batching (batch_frames=True, one
    vmapped program per group) must be bit-identical to the per-frame
    fused loop — including a ragged tail group (3 frames, group cap
    forced to 2 via _BATCH_GROUP_VOX monkeypatching)."""
    from nellie_tpu.pipeline import fused as fused_mod
    from nellie_tpu.pipeline.fused import FusedSegmentation

    (tmp_path / "a").mkdir(exist_ok=True)
    (tmp_path / "b").mkdir(exist_ok=True)
    fi_a = _make_input(tmp_path / "a", "cells", n_t=3)
    fi_b = _make_input(tmp_path / "b", "cells", n_t=3)
    im_a, im_b = ImInfo(fi_a), ImInfo(fi_b)
    FusedSegmentation(im_a, batch_frames=False).run()
    frame_vox = 12 * 48 * 48
    orig = fused_mod._BATCH_GROUP_VOX
    fused_mod._BATCH_GROUP_VOX = 2 * frame_vox  # groups of 2 + tail of 1
    try:
        seg = FusedSegmentation(im_b, batch_frames=True)
        times = seg.run()
    finally:
        fused_mod._BATCH_GROUP_VOX = orig
    assert "seg_batch_single" in times
    _assert_artifacts_equal(im_a, im_b)


@pytest.mark.slow
def test_fused_full_run_produces_all_artifacts(tmp_path):
    """run(fused=True) end-to-end: downstream stages consume the fused
    artifacts and the timing dict carries the fused key."""
    import os

    from nellie_tpu.pipeline.run import run

    fi = _make_input(tmp_path, "cells")
    im_info, timings = run(fi, return_timings=True, warm_start=False)
    assert "seg_fused" in timings
    pp = im_info.pipeline_paths
    for key in STAGE14_ARTIFACTS + ("flow_vector_array", "features_organelles",
                                    "adjacency_maps"):
        assert os.path.exists(pp[key]), key


@pytest.mark.slow
def test_fused_stage_fencing_times(tmp_path):
    """fence_stages returns a per-stage device-time dict."""
    from nellie_tpu.pipeline.fused import FusedSegmentation

    fi = _make_input(tmp_path, "cells", n_t=1)
    seg = FusedSegmentation(ImInfo(fi))
    times = seg.run(fence_stages=True)
    assert set(times) == {"filter", "label", "network", "markers"}
    assert all(v > 0 for v in times.values())


def test_blob_codec_roundtrip_and_fallbacks():
    """The single-blob sparse pull (pipeline/fused.py) must round-trip
    every member exactly, honor support containment (skel/pc/marker/
    distance ride the labels support), and fall back to the dense pull
    on uint16 overflow."""
    import jax.numpy as jnp
    from nellie_tpu.pipeline import fused

    shape = (16, 512, 512)  # 4.2 Mvox: above MIN_COMPRESS_ELEMS
    size = int(np.prod(shape))
    rng = np.random.default_rng(0)
    mask = np.zeros(shape, bool)
    mask[4:8, 100:180, 50:300] = True          # ~1% fg
    labels = np.where(mask, rng.integers(1, 300, shape), 0).astype(np.int32)
    branch = np.where(mask, rng.integers(0, 200, shape), 0).astype(np.uint32)
    skel = np.zeros(shape, np.int32)
    skel[5, 120:160, 60:280] = rng.integers(1, 50, (40, 220))
    pc = np.zeros(shape, np.uint8)
    pc[5, 120:160, 60:280] = rng.integers(0, 4, (40, 220))
    marker = np.zeros(shape, np.uint8)
    marker[5, 125, 70:90] = 1
    distance = np.where(mask, rng.random(shape).astype(np.float32) + 0.1, 0.0)
    frangi = np.where(rng.random(shape) < 0.04, rng.random(shape), 0.0).astype(np.float32)
    border = (rng.random(shape) < 0.01).astype(np.uint8)

    arrs = {k: jnp.asarray(v) for k, v in dict(
        labels=labels, branch=branch, skel=skel, pixel_class=pc,
        marker=marker, distance=distance.astype(np.float32),
        frangi=frangi, border=border).items()}
    pulls = fused._sparse_pull_bundle(arrs)
    assert "blob" in pulls
    pulls["_blob_host"] = np.asarray(pulls["blob"])

    np.testing.assert_array_equal(
        fused._finish_blob(pulls, shape, "labels", np.int32), labels)
    np.testing.assert_array_equal(
        fused._finish_blob(pulls, shape, "branch", np.uint32), branch)
    np.testing.assert_array_equal(
        fused._finish_blob(pulls, shape, "skel", np.int32), skel)
    np.testing.assert_array_equal(
        fused._finish_blob(pulls, shape, "pixel_class", np.uint8), pc)
    np.testing.assert_array_equal(
        fused._finish_blob(pulls, shape, "marker", np.uint8), marker)
    np.testing.assert_array_equal(
        fused._finish_blob(pulls, shape, "distance", np.float32),
        distance.astype(np.float32))
    np.testing.assert_array_equal(
        fused._finish_blob(pulls, shape, "frangi", np.float32), frangi)
    np.testing.assert_array_equal(
        fused._finish_blob(pulls, shape, "border", np.uint8), border)

    # uint16 overflow on a label-valued member -> dense fallback, exact
    big = labels.copy()
    big[5, 120, 60] = 70000
    arrs["labels"] = jnp.asarray(big)
    pulls = fused._sparse_pull_bundle(arrs)
    pulls["_blob_host"] = np.asarray(pulls["blob"])
    np.testing.assert_array_equal(
        fused._finish_blob(pulls, shape, "labels", np.int32), big)
    # other members still decode from the blob
    np.testing.assert_array_equal(
        fused._finish_blob(pulls, shape, "branch", np.uint32), branch)

    # support-capacity overflow (dense frangi) -> dense fallback, exact
    dense_frangi = (rng.random(shape) + 0.1).astype(np.float32)
    arrs["frangi"] = jnp.asarray(dense_frangi)
    pulls = fused._sparse_pull_bundle(arrs)
    pulls["_blob_host"] = np.asarray(pulls["blob"])
    np.testing.assert_array_equal(
        fused._finish_blob(pulls, shape, "frangi", np.float32), dense_frangi)
