"""Full end-to-end pipeline test on synthetic moving-tube data."""
import os

import numpy as np
import pandas as pd
import pytest

from nellie_tpu.io import ome as ome_mod
from nellie_tpu.io import tiff as tifffile
from nellie_tpu.io.verifier import FileInfo


def _make_input(tmp_path, n_t=2, seed=0):
    shape = (n_t, 12, 48, 48)
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0 : shape[1], 0 : shape[2], 0 : shape[3]]
    frames = []
    for t in range(n_t):
        tube = 900.0 * np.exp(
            -(((z - 6) ** 2) * 0.25 + (y - 24 - t + 6 * np.sin(x / 9.0)) ** 2 / 2)
            / (2 * 2.2**2)
        )
        frames.append(np.clip(tube + rng.normal(100, 5, shape[1:]), 0, None))
    data = np.stack(frames).astype(np.uint16)
    desc = ome_mod.build_ome_xml(
        "TZYX", shape, "uint16", dim_res={"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 2.0})
    path = tmp_path / "cells.ome.tif"
    tifffile.imwrite(path, data, description=desc)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    return fi


@pytest.mark.slow
def test_full_pipeline_end_to_end(tmp_path):
    from nellie_tpu.pipeline.run import run

    fi = _make_input(tmp_path)
    im_info, timings = run(fi, timeit=False, return_timings=True)

    pp = im_info.pipeline_paths
    # every artifact exists
    for key in ("im_preprocessed", "im_instance_label", "im_skel", "im_skel_relabelled",
                "im_pixel_class", "im_marker", "im_distance", "im_border",
                "flow_vector_array", "voxel_matches", "im_branch_label_reassigned",
                "im_obj_label_reassigned", "features_voxels", "features_nodes",
                "features_branches", "features_organelles", "features_image",
                "adjacency_maps"):
        assert os.path.exists(pp[key]), key

    labels = np.asarray(im_info.get_memmap(pp["im_instance_label"]))
    assert (labels > 0).any()
    skel = np.asarray(im_info.get_memmap(pp["im_skel"]))
    assert (skel > 0).any()

    flow = np.load(pp["flow_vector_array"])
    assert flow.shape[1] == 8

    # feature CSVs parse and have the expected grammar
    voxels = pd.read_csv(pp["features_voxels"])
    assert {"t", "label", "intensity_raw", "structure_raw",
            "linear_vel_raw", "x_raw", "y_raw", "z_raw"} <= set(voxels.columns)
    assert len(voxels) == (labels > 0).sum()

    organelles = pd.read_csv(pp["features_organelles"])
    assert {"organelle_area_raw", "organelle_solidity_raw",
            "intensity_mean", "intensity_std_dev"} <= set(organelles.columns)
    n_labels = sum(len(np.unique(labels[t])) - 1 for t in range(labels.shape[0]))
    assert len(organelles) == n_labels

    branches = pd.read_csv(pp["features_branches"])
    assert {"branch_length_raw", "branch_tortuosity_raw",
            "branch_thickness_raw"} <= set(branches.columns)
    assert (branches["branch_length_raw"].dropna() >= 0).all()

    image = pd.read_csv(pp["features_image"])
    assert len(image) == 2
    assert "intensity_mean" in image.columns

    nodes = pd.read_csv(pp["features_nodes"])
    assert {"node_thickness_raw", "divergence_raw", "convergence_raw",
            "vergere_raw"} <= set(nodes.columns)

    # adjacency pickle structure
    import pickle

    with open(pp["adjacency_maps"], "rb") as f:
        edges = pickle.load(f)
    assert set(edges.keys()) == {"v_b", "v_n", "v_o", "n_b", "n_o", "b_o"}
    assert len(edges["v_o"]) == 2
    assert edges["v_o"][0].shape[1] == 2

    # reassigned labels exist and t=0 matches instance labels
    reassigned = np.asarray(im_info.get_memmap(pp["im_obj_label_reassigned"]))
    np.testing.assert_array_equal(reassigned[0], labels[0])

    # resume semantics: artifacts allow stage re-run without error
    from nellie_tpu.stages.networking import Network

    Network(im_info).run()


@pytest.mark.slow
def test_pipeline_2d_timeseries(tmp_path):
    """BASELINE config #2: 2D + timeseries — Frangi + labelling +
    Hu-moment tracking per frame."""
    from nellie_tpu.pipeline.run import run

    rng = np.random.default_rng(4)
    frames = []
    y, x = np.mgrid[0:64, 0:64]
    for t in range(3):
        line = 700 * np.exp(-((y - 30 - 2 * t + 6 * np.sin(x / 7)) ** 2) / (2 * 2.0**2))
        frames.append(np.clip(line + rng.normal(80, 5, (64, 64)), 0, None))
    data = np.stack(frames).astype(np.uint16)
    desc = ome_mod.build_ome_xml("TYX", data.shape, "uint16",
                                 dim_res={"X": 0.1, "Y": 0.1, "Z": None, "T": 2.0})
    path = tmp_path / "series2d.ome.tif"
    tifffile.imwrite(path, data, description=desc)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()

    im_info = run(fi)
    pp = im_info.pipeline_paths
    labels = np.asarray(im_info.get_memmap(pp["im_instance_label"]))
    assert labels.shape == (3, 64, 64)
    assert all((labels[t] > 0).any() for t in range(3))
    flow = np.load(pp["flow_vector_array"])
    assert flow.shape[1] == 6  # 2D rows: t, y, x, vy, vx, cost
    assert flow.shape[0] > 0
    # the line moves +2 in y per frame
    assert np.median(flow[:, 3]) == pytest.approx(2, abs=1.0)
    organelles = pd.read_csv(pp["features_organelles"])
    assert len(organelles) >= 3


@pytest.mark.slow
def test_pipeline_2d_single_frame(tmp_path):
    """2D no-T path: tracking stages no-op, features still produced."""
    from nellie_tpu.pipeline.run import run

    rng = np.random.default_rng(1)
    y, x = np.mgrid[0:64, 0:64]
    line = 700 * np.exp(-((y - 32 + 6 * np.sin(x / 7)) ** 2) / (2 * 2.0**2))
    data = np.clip(line + rng.normal(80, 5, (64, 64)), 0, None).astype(np.uint16)
    desc = ome_mod.build_ome_xml("YX", data.shape, "uint16",
                                 dim_res={"X": 0.1, "Y": 0.1, "Z": None, "T": None})
    path = tmp_path / "single.ome.tif"
    tifffile.imwrite(path, data, description=desc)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()

    im_info = run(fi)
    pp = im_info.pipeline_paths
    assert os.path.exists(pp["features_organelles"])
    organelles = pd.read_csv(pp["features_organelles"])
    assert len(organelles) >= 1
    # no-T: no flow vector file content expected
    assert not os.path.exists(pp["flow_vector_array"]) or \
        np.load(pp["flow_vector_array"]).size == 0
