"""Hu-moment tracking tests: moment parity, log-Hu stability, matching."""
import numpy as np
import pytest

import jax.numpy as jnp

from nellie_tpu.io import ome as ome_mod
from nellie_tpu.io import tiff as tifffile
from nellie_tpu.io.verifier import FileInfo, ImInfo
from nellie_tpu.kernels import matching, moments


def _np_normalized_moments(images):
    """Direct numpy port of the reference broadcasting implementation
    (hu_tracking.py:228-276) as ground truth."""
    n, h, w = images.shape
    ext = images[:, :, :, None, None]
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    x = x[None, :, :, None, None]
    y = y[None, :, :, None, None]
    powers = np.arange(4)
    px = powers[None, None, None, :, None]
    py = powers[None, None, None, None, :]
    M = np.sum(ext * (x**px) * (y**py), axis=(1, 2))
    x_bar = (M[:, 1, 0] / (M[:, 0, 0] + 1e-12))[:, None, None, None, None]
    y_bar = (M[:, 0, 1] / (M[:, 0, 0] + 1e-12))[:, None, None, None, None]
    mu = np.sum(ext * (x - x_bar) ** px * (y - y_bar) ** py, axis=(1, 2))
    ipj = np.arange(4)[:, None] + np.arange(4)[None, :]
    denom = (M[:, 0, 0][:, None, None] ** ((ipj[None] + 2) / 2.0)) + 1e-12
    return mu / denom


def test_normalized_moments_match_reference_semantics(rng):
    images = rng.random((8, 15, 17)).astype(np.float32) * (rng.random((8, 15, 17)) > 0.5)
    ours = np.asarray(moments.normalized_moments(jnp.asarray(images)))
    ref = _np_normalized_moments(images.astype(np.float64))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-5)


def test_hu_invariance_under_rotation(rng):
    im = np.zeros((32, 32), np.float32)
    im[8:20, 12:17] = 1.0
    im90 = np.rot90(im).copy()
    hu_a = np.asarray(moments.hu_2d(jnp.asarray(im[None])))
    hu_b = np.asarray(moments.hu_2d(jnp.asarray(im90[None])))
    np.testing.assert_allclose(hu_a, hu_b, rtol=1e-3, atol=1e-6)


def test_log_hu_finite_on_zeros():
    hu = jnp.zeros((4, 6), jnp.float32)
    out = np.asarray(moments.log_hu(hu))
    assert np.isfinite(out).all()


def test_masked_mean_variance(rng):
    images = rng.random((5, 10, 11)).astype(np.float32)
    images[images < 0.4] = 0.0
    out = np.asarray(moments.masked_mean_variance(jnp.asarray(images)))
    for i in range(5):
        nz = images[i][images[i] != 0]
        if nz.size:
            assert out[i, 0] == pytest.approx(nz.mean(), rel=1e-4)
            assert out[i, 1] == pytest.approx(nz.var(), rel=1e-3, abs=1e-6)


def _synthetic_frames(n=30, dim=3, shift=(0.0, 0.4, 0.0), seed=0):
    rng = np.random.default_rng(seed)
    coords_pre = rng.random((n, dim)) * 20
    coords_post = coords_pre + np.asarray(shift)
    stats = rng.random((n, 4)).astype(np.float32)
    hu = rng.random((n, 18)).astype(np.float32)
    # slight feature noise frame to frame
    stats_post = stats + rng.normal(0, 0.01, stats.shape).astype(np.float32)
    hu_post = hu + rng.normal(0, 0.01, hu.shape).astype(np.float32)
    return coords_post, coords_pre, stats_post, stats, hu_post, hu


def test_match_frames_recovers_identity():
    post, pre, s_post, s_pre, h_post, h_pre = _synthetic_frames()
    rows, cols, costs = matching.match_frames(post, pre, s_post, s_pre, h_post, h_pre, 1.0)
    assert len(rows) > 0
    pairs = set(zip(rows, cols))
    correct = sum(1 for r, c in pairs if r == c)
    assert correct / len(pairs) > 0.9


def test_match_tiled_equals_dense():
    """Mode parity (the reference's dense-vs-sparse invariant,
    test_hu_tracking.py:27-55): tiny tiles must reproduce one-shot dense."""
    post, pre, s_post, s_pre, h_post, h_pre = _synthetic_frames(n=100, seed=3)
    a = matching.match_frames(post, pre, s_post, s_pre, h_post, h_pre, 1.0, tile_rows=100000)
    b = matching.match_frames(post, pre, s_post, s_pre, h_post, h_pre, 1.0, tile_rows=7)
    assert sorted(zip(a[0], a[1])) == sorted(zip(b[0], b[1]))
    np.testing.assert_allclose(sorted(a[2]), sorted(b[2]), rtol=1e-4)


def test_hu_tracking_stage_end_to_end(tmp_path):
    # two blobs moving +2 voxels in y per frame
    shape = (3, 8, 32, 32)
    raw = np.zeros(shape, np.float32)
    z, y, x = np.mgrid[0:8, 0:32, 0:32]
    for t in range(3):
        for cy, cx in ((8 + 2 * t, 10), (20 + 2 * t, 22)):
            raw[t] += 500 * np.exp(-(((z - 4) ** 2) / 2 + ((y - cy) ** 2 + (x - cx) ** 2) / 4))
    labels = (raw > 100).astype(np.int32)
    frangi = (raw / raw.max()).astype(np.float32) * (raw > 50)
    marker = np.zeros(shape, np.uint8)
    for t in range(3):
        for cy, cx in ((8 + 2 * t, 10), (20 + 2 * t, 22)):
            marker[t, 4, cy, cx] = 1
    distance = (labels > 0).astype(np.float32) * 2.0

    desc = ome_mod.build_ome_xml("TZYX", shape, "uint16",
                                 dim_res={"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 1.0})
    path = tmp_path / "input.ome.tif"
    tifffile.imwrite(path, raw.astype(np.uint16), description=desc)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    im_info = ImInfo(fi)
    im_info.allocate_memory(im_info.pipeline_paths["im_preprocessed"], dtype="float",
                            data=frangi, description="frangi")
    im_info.allocate_memory(im_info.pipeline_paths["im_instance_label"], dtype="int32",
                            data=labels, description="labels")
    im_info.allocate_memory(im_info.pipeline_paths["im_marker"], dtype="uint8",
                            data=marker, description="markers")
    im_info.allocate_memory(im_info.pipeline_paths["im_distance"], dtype="float32",
                            data=distance, description="distance")

    from nellie_tpu.stages.hu_tracking import HuMomentTracking

    HuMomentTracking(im_info, max_distance_um=2.0).run()
    flow = np.load(im_info.pipeline_paths["flow_vector_array"])
    assert flow.shape[1] == 8  # 3D rows: t, z, y, x, vz, vy, vx, cost
    assert flow.shape[0] >= 4  # two blobs x two transitions, mutual candidates
    # vectors should be ~(0, +2, 0)
    assert np.median(flow[:, 4]) == pytest.approx(0, abs=0.5)
    assert np.median(flow[:, 5]) == pytest.approx(2, abs=0.5)
    assert np.median(flow[:, 6]) == pytest.approx(0, abs=0.5)


@pytest.mark.parametrize("mode", ["auto", "dense", "sparse"])
def test_match_modes_agree(mode):
    """mode only changes tiling; results must be identical."""
    post, pre, s_post, s_pre, h_post, h_pre = _synthetic_frames(n=60, seed=9)
    base = matching.match_frames(post, pre, s_post, s_pre, h_post, h_pre, 1.0)
    tile = {"dense": 60, "sparse": 7, "auto": 8192}[mode]
    out = matching.match_frames(post, pre, s_post, s_pre, h_post, h_pre, 1.0,
                                tile_rows=tile)
    assert sorted(zip(base[0], base[1])) == sorted(zip(out[0], out[1]))


def test_frame_features_cache_parity(tmp_path):
    """_get_frame_features with the device-frame cache populated (the
    fused-handoff path) must produce identical features to the memmap
    upload path."""
    shape = (2, 8, 32, 32)
    raw = np.zeros(shape, np.float32)
    z, y, x = np.mgrid[0:8, 0:32, 0:32]
    for t in range(2):
        for cy, cx in ((8 + 2 * t, 10), (20 + 2 * t, 22)):
            raw[t] += 500 * np.exp(-(((z - 4) ** 2) / 2 + ((y - cy) ** 2 + (x - cx) ** 2) / 4))
    labels = (raw > 100).astype(np.int32)
    frangi = (raw / raw.max()).astype(np.float32) * (raw > 50)
    marker = np.zeros(shape, np.uint8)
    for t in range(2):
        for cy, cx in ((8 + 2 * t, 10), (20 + 2 * t, 22)):
            marker[t, 4, cy, cx] = 1
    distance = (labels > 0).astype(np.float32) * 2.0

    desc = ome_mod.build_ome_xml("TZYX", shape, "uint16",
                                 dim_res={"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 1.0})
    path = tmp_path / "input.ome.tif"
    tifffile.imwrite(path, raw.astype(np.uint16), description=desc)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    im_info = ImInfo(fi)
    im_info.allocate_memory(im_info.pipeline_paths["im_preprocessed"], dtype="float",
                            data=frangi, description="frangi")
    im_info.allocate_memory(im_info.pipeline_paths["im_instance_label"], dtype="int32",
                            data=labels, description="labels")
    im_info.allocate_memory(im_info.pipeline_paths["im_marker"], dtype="uint8",
                            data=marker, description="markers")
    im_info.allocate_memory(im_info.pipeline_paths["im_distance"], dtype="float32",
                            data=distance, description="distance")

    from nellie_tpu.stages.hu_tracking import HuMomentTracking
    from nellie_tpu.utils.device_cache import frame_cache

    def features(use_cache):
        stage = HuMomentTracking(im_info, max_distance_um=2.0)
        stage.low_memory = False
        stage._use_frame_cache = use_cache
        stage._get_t()
        stage._allocate_memory()
        if use_cache:
            cache = frame_cache(im_info, create=True)
            for t in range(2):
                # raw is cached as the uint16 on-disk frame (the fused
                # loop uploads the memmap frame verbatim)
                cache.put("im", t, jnp.asarray(np.asarray(stage.im_memmap[t])))
                cache.put("im_preprocessed", t, jnp.asarray(frangi[t]))
                cache.put("im_distance", t, jnp.asarray(distance[t]))
        return [stage._get_frame_features(t) for t in range(2)]

    plain = features(False)
    cached = features(True)
    assert len(frame_cache(im_info)) == 0  # take() drains the cache
    for p, c in zip(plain, cached):
        np.testing.assert_array_equal(p.coords_voxel, c.coords_voxel)
        np.testing.assert_allclose(p.stats, c.stats, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(p.hu, c.hu, rtol=1e-5, atol=1e-6)
