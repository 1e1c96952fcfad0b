"""run(config=...) drives every stage from a SettingsConfig tree.

The reference's de-facto config system is the GUI Settings tab
(``/root/reference/nellie_napari/nellie_settings.py:20-99``); here the
same typed tree also drives the headless API/CLI.  These tests run the
full pipeline from a config JSON and assert the basic toggles
(``voxel_reassign``, per-stage ``low_memory``) actually change what runs.
"""
import os

import numpy as np
import pytest

from nellie_tpu.io import ome as ome_mod
from nellie_tpu.io import tiff as tifffile
from nellie_tpu.io.verifier import FileInfo
from nellie_tpu.pipeline.run import run
from nellie_tpu.plugin.config import SettingsConfig

# compile-heavy: runs in the CI tests-slow job, not the fast path
pytestmark = pytest.mark.slow


def _dataset(tmp_path, t_frames=2, shape=(12, 48, 48)):
    os.makedirs(str(tmp_path), exist_ok=True)
    z, y, x = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
    tube = 900.0 * np.exp(
        -(((z - 6) ** 2) + (y - 24 + 6 * np.sin(x / 8.0)) ** 2) / (2 * 2.6 ** 2))
    rng = np.random.default_rng(0)
    data = np.stack([
        np.clip(np.roll(tube, 2 * t, axis=1) + rng.normal(100, 5, shape), 0, None)
        for t in range(t_frames)
    ]).astype(np.uint16)
    desc = ome_mod.build_ome_xml(
        "TZYX", data.shape, "uint16",
        dim_res={"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 1.0})
    path = str(tmp_path / "cells.ome.tif")
    tifffile.imwrite(path, data, description=desc)
    fi = FileInfo(path)
    fi.find_metadata()
    fi.load_metadata()
    return fi


def test_run_with_config_json_skips_reassign(tmp_path):
    """config JSON path in, voxel_reassign=False: the reassignment stage
    is skipped (no reassigned artifacts, no 'reassign' timing) and the
    feature CSVs still appear (Hierarchy NaNs the reassigned column)."""
    fi = _dataset(tmp_path / "d1")
    cfg = SettingsConfig(voxel_reassign=False)
    cfg_path = str(tmp_path / "settings.json")
    cfg.save(cfg_path)

    im_info, timings = run(fi, config=cfg_path, return_timings=True)
    assert "reassign" not in timings
    pp = im_info.pipeline_paths
    assert not os.path.exists(pp["im_obj_label_reassigned"])
    for key in ("features_branches", "features_organelles", "features_image"):
        assert os.path.exists(pp[key]), key


def test_run_with_config_low_memory_uses_classic_path(tmp_path):
    """Per-stage low_memory in the config forces the classic per-stage
    adaptive ladder instead of the fused whole-frame loop."""
    fi = _dataset(tmp_path / "d2", t_frames=1)
    cfg = SettingsConfig(preprocessing_low_memory=True,
                         preprocessing_max_chunk_voxels=int(2e4),
                         voxel_reassign=True)

    im_info, timings = run(fi, config=cfg, return_timings=True)
    assert "seg_fused" not in timings
    assert "filter" in timings and "label" in timings
    assert os.path.exists(im_info.pipeline_paths["im_instance_label"])


def test_run_config_overrides_stage_params(tmp_path):
    """A config radius change must reach the Filter sigma scheme (spot
    check that the tree actually lands in constructors, fused path)."""
    from nellie_tpu.pipeline.fused import FusedSegmentation

    fi = _dataset(tmp_path / "d3", t_frames=1)
    from nellie_tpu.io.verifier import ImInfo

    im_info = ImInfo(fi)
    from nellie_tpu.plugin import config as cfg_mod

    cfg = SettingsConfig(preprocessing_max_radius_um=2.0,
                         mocap_num_sigma=3)
    f_kw = cfg_mod.preprocessing_params(cfg)
    f_kw["remove_edges"] = cfg.remove_edges
    seg = FusedSegmentation(
        im_info,
        filter_kwargs=f_kw,
        label_kwargs=cfg_mod.segmentation_label_params(cfg),
        network_kwargs=cfg_mod.segmentation_network_params(cfg),
        markers_kwargs=cfg_mod.mocap_params(cfg))
    assert seg.filter.max_radius_um == 2.0
    assert seg.markers.num_sigma == 3
