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


def test_plugin_gated_without_napari():
    import nellie_tpu.plugin as plugin

    with pytest.raises(ImportError, match="napari"):
        plugin.NellieLoader(None)
