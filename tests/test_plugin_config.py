"""GUI-free tests of the plugin config system and analysis helpers."""
import numpy as np
import pytest

from nellie_tpu.plugin import config as cfg


def test_settings_config_roundtrip(tmp_path):
    c = cfg.SettingsConfig()
    c.remove_edges = True
    c.preprocessing_max_radius_um = 2.5
    c.segmentation_label_threshold = 0.01
    c.feature_skip_nodes = False
    path = tmp_path / "settings.json"
    c.save(str(path))
    c2 = cfg.SettingsConfig.load(str(path))
    assert c2 == c


def test_params_match_stage_signatures():
    """Every kwargs dict must be accepted by its stage constructor."""
    import inspect

    from nellie_tpu.stages.filtering import Filter
    from nellie_tpu.stages.hierarchical import Hierarchy
    from nellie_tpu.stages.hu_tracking import HuMomentTracking
    from nellie_tpu.stages.labelling import Label
    from nellie_tpu.stages.mocap_marking import Markers
    from nellie_tpu.stages.networking import Network
    from nellie_tpu.stages.voxel_reassignment import VoxelReassigner

    c = cfg.SettingsConfig(
        preprocessing_num_t=3, segmentation_label_threshold=0.5,
        feature_skip_nodes=True, feature_node_chunk_size=1000,
    )
    pairs = [
        (cfg.preprocessing_params(c), Filter),
        (cfg.segmentation_label_params(c), Label),
        (cfg.segmentation_network_params(c), Network),
        (cfg.mocap_params(c), Markers),
        (cfg.tracking_params(c), HuMomentTracking),
        (cfg.reassign_params(c), VoxelReassigner),
        (cfg.feature_params(c), Hierarchy),
    ]
    for params, stage in pairs:
        sig = inspect.signature(stage.__init__)
        accepted = set(sig.parameters) - {"self", "im_info", "viewer"}
        unknown = set(params) - accepted
        assert not unknown, f"{stage.__name__}: unknown kwargs {unknown}"


def test_optional_none_pruned():
    c = cfg.SettingsConfig()  # all Optionals default None
    params = cfg.preprocessing_params(c)
    assert "num_t" not in params
    assert "frob_thresh" not in params
    c2 = cfg.SettingsConfig(preprocessing_num_t=5)
    assert cfg.preprocessing_params(c2)["num_t"] == 5


def test_feature_params_node_level():
    c = cfg.SettingsConfig(analyze_node_level=True)
    assert cfg.feature_params(c)["skip_nodes"] is False
    c2 = cfg.SettingsConfig(feature_skip_nodes=True, analyze_node_level=True)
    assert cfg.feature_params(c2)["skip_nodes"] is True


def test_split_feature_columns():
    from nellie_tpu.plugin.analysis_utils import split_feature_columns

    cols = ["t", "label", "intensity_raw", "intensity_mean", "intensity_std_dev",
            "branch_length_raw", "x_raw"]
    features = split_feature_columns(cols)
    assert features["intensity"] == ["raw", "mean", "std_dev"]
    assert features["branch_length"] == ["raw"]
    assert features["x"] == ["raw"]


def test_plugin_gated_without_napari(monkeypatch):
    import sys

    import nellie_tpu.plugin as plugin

    # force-absent regardless of real installs or the qt_stubs used by
    # test_plugin_widgets (a None sys.modules entry makes import raise)
    monkeypatch.setitem(sys.modules, "napari", None)
    monkeypatch.setitem(sys.modules, "qtpy", None)
    with pytest.raises(ImportError, match="napari"):
        plugin.NellieLoader(None)


def test_hierarchy_lookup_click_table():
    """Click->hierarchy mapping (reference nellie_analysis.py:759): a click
    on a labeled voxel resolves its voxel/node/branch/organelle/image
    rows through the adjacency edge lists."""
    import pandas as pd

    from nellie_tpu.plugin.analysis_utils import hierarchy_lookup

    # frame 0 has 3 labeled voxels at known coords (argwhere order)
    label_coords = [np.array([[1, 2, 3], [1, 2, 4], [5, 6, 7]])]
    dfs = {
        "voxel": pd.DataFrame({"t": [0, 0, 0], "idx": [10, 11, 12]}),
        "node": pd.DataFrame({"t": [0], "node_id": [77]}),
        "branch": pd.DataFrame({"t": [0, 0], "branch_id": [5, 6]}),
        "organelle": pd.DataFrame({"t": [0], "organelle_id": [400],
                                   "label": [9]}),
        "image": pd.DataFrame({"t": [0], "image_id": [0]}),
    }
    adjacency = {
        "v_n": [np.array([[1, 0]])],          # voxel row 1 -> node row 0
        "v_b": [np.array([[1, 1], [2, 0]])],  # voxel row 1 -> branch row 1
        "v_o": [np.array([[1, 9]])],          # voxel row 1 -> organelle LABEL 9
    }

    hit = hierarchy_lookup((0.2, 1.1, 2.0, 3.9), label_coords, dfs,
                           adjacency, no_z=False)
    assert hit is not None
    coord_str, headers, values = hit
    assert coord_str == "(t=0, z=1, y=2, x=4)"
    table = dict(zip(headers, values))
    assert table["Voxel"] == "0"        # first column of voxel row 1 is t=0
    assert table["Nodes"] == "0"
    assert table["Branch"] == "0"
    assert table["Organelle"] == "0"
    assert "Image" in table

    # background click -> no hit
    assert hierarchy_lookup((0, 0, 0, 0), label_coords, dfs, adjacency,
                            no_z=False) is None
    # out-of-range frame -> no hit
    assert hierarchy_lookup((3, 1, 2, 4), label_coords, dfs, adjacency,
                            no_z=False) is None


def test_dim_validation_states():
    """Per-dim red/green semantics (reference nellie_fileselect.py:715):
    required+known -> valid, required+missing -> invalid, absent -> na."""
    from nellie_tpu.plugin.fileselect_utils import dim_validation_states

    states = dim_validation_states("TZYX", {"T": 1.0, "Z": None, "Y": 0.2, "X": 0.2})
    assert states == {"T": "valid", "Z": "invalid", "Y": "valid", "X": "valid"}
    states = dim_validation_states("YX", {"Y": 0.2, "X": 0.2})
    assert states["T"] == "na" and states["Z"] == "na"
    assert dim_validation_states(None, None)["X"] == "na"


def test_preview_display_args():
    """Preview scale/view selection (reference nellie_fileselect.py:1022)."""
    from nellie_tpu.plugin.fileselect_utils import preview_display_args

    scale, nd = preview_display_args("TZYX", (4, 16, 64, 64),
                                     {"Z": 0.5, "Y": 0.2, "X": 0.2})
    assert scale == (0.5, 0.2, 0.2) and nd == 3
    scale, nd = preview_display_args("TYX", (4, 64, 64), {"Y": 0.2, "X": 0.2})
    assert scale == (0.2, 0.2) and nd == 2
    # singleton Z -> 2D view
    _, nd = preview_display_args("TZYX", (4, 1, 64, 64),
                                 {"Z": 0.5, "Y": 0.2, "X": 0.2})
    assert nd == 2
    # missing resolutions -> no scale, still picks the right view
    scale, nd = preview_display_args("TZYX", (4, 16, 64, 64), {})
    assert scale is None and nd == 3


def test_collect_tracks_over_frames():
    """All-frame seeding offsets track ids, stops at first empty frame,
    concatenates properties (reference nellie_visualizer.py:703-760)."""
    from nellie_tpu.plugin.visualizer_utils import collect_tracks_over_frames

    class FakeTracks:
        def __init__(self, per_frame):
            self.per_frame = per_frame
            self.calls = []

        def run(self, label_num=None, start_frame=0, end_frame=None,
                min_track_num=0, skip_coords=1):
            self.calls.append((start_frame, min_track_num, skip_coords, label_num))
            tracks = [[min_track_num + i, start_frame, 0.0, 0.0]
                      for i in range(self.per_frame.get(start_frame, 0))]
            return tracks, {"cost": [0.5] * len(tracks)}

    # frames 0,1 yield 2 tracks each; frame 2 empty -> stop before frame 3
    fake = FakeTracks({0: 2, 1: 2, 3: 9})
    tracks, props = collect_tracks_over_frames(
        fake, start_frame=0, use_all_frames=True, num_frames=4, skip_coords=3)
    assert len(tracks) == 4 and len(props["cost"]) == 4
    ids = [t[0] for t in tracks]
    assert ids == [0, 1, 2, 3]          # ids offset by min_track_num per frame
    assert [c[0] for c in fake.calls] == [0, 1, 2]  # stopped at empty frame 2
    assert all(c[2] == 3 for c in fake.calls)       # skip_coords forwarded

    # single-frame mode: one call from the requested start frame
    fake = FakeTracks({2: 3})
    tracks, _ = collect_tracks_over_frames(
        fake, start_frame=2, use_all_frames=False, num_frames=4, label_num=7)
    assert len(tracks) == 3
    assert fake.calls == [(2, 0, 1, 7)]
