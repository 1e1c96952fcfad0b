"""Features-CSV oracle parity (VERDICT r3 directive #4).

A small synthetic 3D+T dataset runs through the FULL product pipeline;
then every feature column of every CSV is recomputed from the product's
input artifacts with the independent numpy formulas in
``tests/oracle/features.py`` and compared at rtol 1e-4 / NaN-equal
(the tolerance-policy row "features CSVs" in ``algos.py``).

Any drift in a motility/divergence/branch/morphology/aggregation
formula fails here.
"""
import numpy as np
import pandas as pd
import pytest

from nellie_tpu.io import ome as ome_mod
from nellie_tpu.io import tiff as tifffile
from nellie_tpu.io.verifier import FileInfo

from .algos import flow_interp_reference
from .features import (
    STAT_KEYS,
    branch_stats,
    motility_features,
    nanstats,
    node_features,
    region_morphology,
)

VOXEL_STATS = (
    "linear_vel", "angular_vel", "linear_acc", "angular_acc",
    "rel_linear_vel", "rel_angular_vel", "rel_linear_acc",
    "rel_angular_acc", "rel_directionality", "structure", "intensity",
)
NODE_STATS = ("divergence", "convergence", "vergere", "node_thickness")
BRANCH_STATS = (
    "branch_length", "branch_thickness", "branch_aspect_ratio",
    "branch_tortuosity", "branch_area", "branch_axis_length_maj",
    "branch_axis_length_min", "branch_extent", "branch_solidity",
)
ORGANELLE_STATS = (
    "organelle_area", "organelle_axis_length_maj",
    "organelle_axis_length_min", "organelle_extent", "organelle_solidity",
)

DIM_RES = {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 2.0}
SPACING = (DIM_RES["Z"], DIM_RES["Y"], DIM_RES["X"])


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("feat_oracle")
    shape = (2, 12, 48, 48)
    rng = np.random.default_rng(7)
    z, y, x = np.mgrid[0:shape[1], 0:shape[2], 0:shape[3]]
    frames = []
    for t in range(shape[0]):
        tube = 900.0 * np.exp(
            -(((z - 6) ** 2) * 0.25 + (y - 24 - t + 6 * np.sin(x / 9.0)) ** 2 / 2)
            / (2 * 2.2 ** 2))
        blob = 700.0 * np.exp(-((z - 6) ** 2 + (y - 10) ** 2 + (x - 10 - t) ** 2) / (2 * 2.5 ** 2))
        frames.append(np.clip(tube + blob + rng.normal(100, 5, shape[1:]), 0, None))
    data = np.stack(frames).astype(np.uint16)
    desc = ome_mod.build_ome_xml("TZYX", shape, "uint16", dim_res=DIM_RES)
    path = tmp / "cells.ome.tif"
    tifffile.imwrite(path, data, description=desc)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()

    from nellie_tpu.pipeline.run import run

    im_info = run(fi, warm_start=False)
    pp = im_info.pipeline_paths

    def mm(key):
        return np.asarray(im_info.get_memmap(pp[key]))

    arts = {
        "raw": np.asarray(im_info.get_memmap(im_info.im_path)),
        "frangi": mm("im_preprocessed"),
        "labels": mm("im_instance_label"),
        "skel": mm("im_skel"),
        "branch_labels": mm("im_skel_relabelled"),
        "pixel_class": mm("im_pixel_class"),
        "distance": mm("im_distance"),
        "border": mm("im_border"),
        "flow": np.load(pp["flow_vector_array"]),
        "im_info": im_info,
        "csv": {name: pd.read_csv(pp[f"features_{name}"])
                for name in ("voxels", "nodes", "branches", "organelles", "image")},
    }
    return arts


def _interp_flows(arts, coords, t, num_t):
    """Interpolated flow vectors at coords, cross-checked: the oracle
    weighting (``flow_interp_reference``) must agree with the product's
    FlowInterpolator (whose own stage parity lives in
    test_stage_parity.py); the PRODUCT's float32 vectors are returned so
    downstream discrete selections (branch reference voxel) see the
    product's working precision."""
    from nellie_tpu.stages.flow_interpolation import FlowInterpolator

    flow = arts["flow"]
    d = 3
    # FlowInterpolator default: max(0.5 um * T_res, 0.5)
    max_dist = max(0.5 * DIM_RES["T"], 0.5)
    vec01 = vec12 = None
    if t > 0:
        rows = flow[flow[:, 0] == t - 1]
        oracle = flow_interp_reference(
            coords, rows[:, 1:1 + d] + rows[:, 1 + d:1 + 2 * d],
            rows[:, 1 + d:1 + 2 * d], rows[:, -1], np.asarray(SPACING), max_dist)
        vec01 = np.asarray(FlowInterpolator(arts["im_info"], forward=False)
                           .interpolate_coord(coords.astype(np.float32), t), np.float32)
        np.testing.assert_allclose(np.nan_to_num(oracle), np.nan_to_num(vec01),
                                   rtol=1e-4, atol=1e-4)
    if t < num_t - 1:
        rows = flow[flow[:, 0] == t]
        oracle = flow_interp_reference(
            coords, rows[:, 1:1 + d], rows[:, 1 + d:1 + 2 * d], rows[:, -1],
            np.asarray(SPACING), max_dist)
        vec12 = np.asarray(FlowInterpolator(arts["im_info"], forward=True)
                           .interpolate_coord(coords.astype(np.float32), t), np.float32)
        np.testing.assert_allclose(np.nan_to_num(oracle), np.nan_to_num(vec12),
                                   rtol=1e-4, atol=1e-4)
    return vec01, vec12


def _assert_col(df_t, name, expected, context):
    assert name in df_t.columns, f"missing column {name} ({context})"
    got = np.asarray(df_t[name], float)
    exp = np.asarray(expected, float)
    assert got.shape == exp.shape, f"{name} shape {got.shape} vs {exp.shape} ({context})"
    nan_g, nan_e = np.isnan(got), np.isnan(exp)
    np.testing.assert_array_equal(nan_g, nan_e, err_msg=f"{name} NaN pattern ({context})")
    ok = ~nan_g
    np.testing.assert_allclose(got[ok], exp[ok], rtol=1e-4, atol=1e-4,
                               err_msg=f"{name} ({context})")


def _voxel_table(arts, t, num_t):
    labels = arts["labels"][t]
    coords = np.argwhere(labels > 0)
    at = tuple(coords.T)
    vec01, vec12 = _interp_flows(arts, coords.astype(float), t, num_t)
    mot = motility_features(coords, vec01, vec12,
                           arts["branch_labels"][t][at].astype(np.int64),
                           SPACING, DIM_RES["T"], no_z=False)
    stats = np.stack([mot[k] for k in VOXEL_STATS[:9]]
                     + [arts["frangi"][t][at].astype(np.float64),
                        arts["raw"][t][at].astype(np.float64)])
    return coords, vec01, vec12, mot, stats


@pytest.mark.slow
def test_voxel_csv_columns(pipeline_run):
    arts = pipeline_run
    num_t = arts["labels"].shape[0]
    df = arts["csv"]["voxels"]
    for t in range(num_t):
        df_t = df[df["t"] == t].reset_index(drop=True)
        coords, _, _, mot, _ = _voxel_table(arts, t, num_t)
        assert len(df_t) == len(coords)
        for k in VOXEL_STATS[:9]:
            _assert_col(df_t, f"{k}_raw", mot[k], f"voxels t={t}")
        at = tuple(coords.T)
        _assert_col(df_t, "intensity_raw", arts["raw"][t][at], f"voxels t={t}")
        _assert_col(df_t, "structure_raw", arts["frangi"][t][at], f"voxels t={t}")
        _assert_col(df_t, "z_raw", coords[:, 0], f"voxels t={t}")
        _assert_col(df_t, "y_raw", coords[:, 1], f"voxels t={t}")
        _assert_col(df_t, "x_raw", coords[:, 2], f"voxels t={t}")


@pytest.mark.slow
def test_node_csv_columns(pipeline_run):
    arts = pipeline_run
    num_t = arts["labels"].shape[0]
    df = arts["csv"]["nodes"]
    for t in range(num_t):
        df_t = df[df["t"] == t].reset_index(drop=True)
        coords, vec01, vec12, _, stats = _voxel_table(arts, t, num_t)
        nodes = np.argwhere(arts["pixel_class"][t] > 0)
        assert len(df_t) == len(nodes)
        radius = arts["distance"][t][tuple(nodes.T)].astype(np.float64)
        # the node dot products use PHYSICAL flow vectors (voxel flow x
        # spacing), matching _VoxelLevel.vec01/vec12
        sp = np.asarray(SPACING)
        nf = node_features(nodes, radius, coords,
                           None if vec01 is None else vec01 * sp,
                           None if vec12 is None else vec12 * sp,
                           arts["border"][t] > 0, SPACING,
                           arts["labels"][t].shape)
        for k in NODE_STATS:
            _assert_col(df_t, f"{k}_raw", nf[k], f"nodes t={t}")
        # aggregated member-voxel statistics (values gathered at pair_vox,
        # grouped by pair_node)
        agg = nanstats(stats[:, nf["pair_vox"]], nf["pair_node"], len(nodes))
        for i, name in enumerate(VOXEL_STATS):
            for key in STAT_KEYS:
                _assert_col(df_t, f"{name}_{key}", agg[key][i], f"nodes t={t}")


@pytest.mark.slow
def test_branch_csv_columns(pipeline_run):
    arts = pipeline_run
    num_t = arts["labels"].shape[0]
    df = arts["csv"]["branches"]
    for t in range(num_t):
        df_t = df[df["t"] == t].reset_index(drop=True)
        skel = arts["skel"][t]
        row_labels = np.unique(skel[skel > 0])
        assert np.array_equal(np.asarray(df_t["label"]), row_labels)
        bs = branch_stats(skel, arts["border"][t] > 0, SPACING,
                          arts["branch_labels"][t])
        morph = region_morphology(arts["branch_labels"][t], SPACING)
        for name in ("branch_length", "branch_thickness",
                     "branch_aspect_ratio", "branch_tortuosity"):
            exp = [bs[int(l)][name] for l in row_labels]
            _assert_col(df_t, f"{name}_raw", exp, f"branches t={t}")
        for csv_name, m_name in (("branch_area", "area"),
                                 ("branch_axis_length_maj", "major_axis_length"),
                                 ("branch_axis_length_min", "minor_axis_length"),
                                 ("branch_extent", "extent"),
                                 ("branch_solidity", "solidity")):
            exp = [morph.get(int(l), {}).get(m_name, np.nan) for l in row_labels]
            _assert_col(df_t, f"{csv_name}_raw", exp, f"branches t={t}")


@pytest.mark.slow
def test_organelle_csv_columns(pipeline_run):
    arts = pipeline_run
    num_t = arts["labels"].shape[0]
    df = arts["csv"]["organelles"]
    for t in range(num_t):
        df_t = df[df["t"] == t].reset_index(drop=True)
        labels = arts["labels"][t]
        row_labels = np.unique(labels[labels > 0])
        assert np.array_equal(np.asarray(df_t["label"]), row_labels)
        morph = region_morphology(labels, SPACING)
        for csv_name, m_name in (("organelle_area", "area"),
                                 ("organelle_axis_length_maj", "major_axis_length"),
                                 ("organelle_axis_length_min", "minor_axis_length"),
                                 ("organelle_extent", "extent"),
                                 ("organelle_solidity", "solidity")):
            exp = [morph[int(l)][m_name] for l in row_labels]
            _assert_col(df_t, f"{csv_name}_raw", exp, f"organelles t={t}")
        # voxel aggregations per organelle
        coords, _, _, _, stats = _voxel_table(arts, t, num_t)
        comp = labels[tuple(coords.T)].astype(np.int64)
        gid = np.searchsorted(row_labels, comp)
        agg = nanstats(stats, gid, len(row_labels))
        for i, name in enumerate(VOXEL_STATS):
            for key in STAT_KEYS:
                _assert_col(df_t, f"{name}_{key}", agg[key][i], f"organelles t={t}")


@pytest.mark.slow
def test_image_csv_columns(pipeline_run):
    arts = pipeline_run
    num_t = arts["labels"].shape[0]
    df = arts["csv"]["image"]
    assert len(df) == num_t
    for t in range(num_t):
        df_t = df[df["t"] == t].reset_index(drop=True)
        coords, _, _, _, stats = _voxel_table(arts, t, num_t)
        agg = nanstats(stats, np.zeros(len(coords), int), 1)
        for i, name in enumerate(VOXEL_STATS):
            for key in STAT_KEYS:
                _assert_col(df_t, f"{name}_{key}", agg[key][i], f"image t={t}")
