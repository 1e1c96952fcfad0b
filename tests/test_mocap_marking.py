"""Markers stage tests (mirrors the reference's key invariants:
chunked == full, border disjoint from mask)."""
import numpy as np
import pytest

import jax.numpy as jnp

from nellie_tpu.io import ome as ome_mod
from nellie_tpu.io import tiff as tifffile
from nellie_tpu.io.verifier import FileInfo, ImInfo
from nellie_tpu.stages.mocap_marking import Markers
# compile-heavy: runs in the CI tests-slow job, not the fast path
pytestmark = pytest.mark.slow



def _blob_volume(shape=(12, 48, 48), n_blobs=5, seed=0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    z, y, x = np.mgrid[0 : shape[0], 0 : shape[1], 0 : shape[2]]
    for _ in range(n_blobs):
        cz = rng.integers(3, shape[0] - 3)
        cy, cx = rng.integers(8, shape[1] - 8), rng.integers(8, shape[2] - 8)
        vol += 400.0 * np.exp(-(((z - cz) ** 2) / 3 + ((y - cy) ** 2 + (x - cx) ** 2) / 10))
    return vol


def _make_run(tmp_path, raw, labels, dim_res, axes):
    desc = ome_mod.build_ome_xml(axes, raw.shape, raw.dtype.name, dim_res=dim_res)
    path = tmp_path / "input.ome.tif"
    tifffile.imwrite(path, raw, description=desc)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    im_info = ImInfo(fi)
    im_info.allocate_memory(im_info.pipeline_paths["im_instance_label"],
                            dtype="int32", data=labels.astype(np.int32), description="labels")
    return im_info


@pytest.fixture
def marker_run(tmp_path):
    vol = _blob_volume()
    labels = (vol > 80).astype(np.int32)
    raw = (vol + 100).astype(np.uint16)
    return _make_run(tmp_path, raw[None], labels[None],
                     {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": None}, "TZYX")


def test_markers_outputs(marker_run):
    Markers(marker_run).run()
    marker = np.asarray(marker_run.get_memmap(marker_run.pipeline_paths["im_marker"]))[0]
    distance = np.asarray(marker_run.get_memmap(marker_run.pipeline_paths["im_distance"]))[0]
    border = np.asarray(marker_run.get_memmap(marker_run.pipeline_paths["im_border"]))[0]
    labels = np.asarray(marker_run.get_memmap(marker_run.pipeline_paths["im_instance_label"]))[0]
    mask = labels > 0

    assert marker.dtype == np.uint8 and border.dtype == np.uint8
    assert distance.dtype == np.float32
    assert marker.sum() > 0
    # markers only inside objects
    assert (marker.astype(bool) & ~mask).sum() == 0
    # border is the outside shell: disjoint from the object mask
    assert (border.astype(bool) & mask).sum() == 0
    assert border.sum() > 0
    # distance zero outside mask, positive inside, clamped
    assert (distance[~mask] == 0).all()
    assert distance[mask].max() > 0
    max_radius_px = 1.0 / 0.2
    assert distance.max() <= 2 * max_radius_px + 1e-5


def test_low_memory_chunked_equals_full(marker_run):
    """The reference's key chunking-correctness invariant
    (test_mocap_marking.py:35-60): chunked == full volume."""
    Markers(marker_run).run()
    full_marker = np.asarray(marker_run.get_memmap(marker_run.pipeline_paths["im_marker"])).copy()
    full_dist = np.asarray(marker_run.get_memmap(marker_run.pipeline_paths["im_distance"])).copy()
    full_border = np.asarray(marker_run.get_memmap(marker_run.pipeline_paths["im_border"])).copy()

    Markers(marker_run, low_memory=True, max_chunk_voxels=12 * 24 * 24).run()
    lm_marker = np.asarray(marker_run.get_memmap(marker_run.pipeline_paths["im_marker"]))
    lm_dist = np.asarray(marker_run.get_memmap(marker_run.pipeline_paths["im_distance"]))
    lm_border = np.asarray(marker_run.get_memmap(marker_run.pipeline_paths["im_border"]))

    np.testing.assert_array_equal(full_border, lm_border)
    np.testing.assert_allclose(full_dist, lm_dist, atol=1e-5)
    np.testing.assert_array_equal(full_marker, lm_marker)


def test_markers_2d(tmp_path):
    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:64, 0:64]
    vol = 500 * np.exp(-(((y - 20) ** 2 + (x - 20) ** 2) / 12)) + \
          500 * np.exp(-(((y - 45) ** 2 + (x - 42) ** 2) / 12))
    labels = (vol > 60).astype(np.int32)
    raw = (vol + 100).astype(np.uint16)
    im_info = _make_run(tmp_path, raw, labels, {"X": 0.1, "Y": 0.1, "Z": None, "T": None}, "YX")
    Markers(im_info).run()
    marker = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_marker"]))[0]
    assert marker.sum() >= 2  # one marker per blob at least


def test_markers_use_im_frangi(marker_run):
    """use_im='frangi': peak detection runs on the Frangi image."""
    frangi = np.asarray(
        marker_run.get_memmap(marker_run.pipeline_paths["im_instance_label"])
    ).astype(np.float32)
    marker_run.allocate_memory(marker_run.pipeline_paths["im_preprocessed"],
                               dtype="float", data=frangi, description="frangi")
    Markers(marker_run, use_im="frangi").run()
    marker = np.asarray(marker_run.get_memmap(marker_run.pipeline_paths["im_marker"]))[0]
    labels = np.asarray(marker_run.get_memmap(marker_run.pipeline_paths["im_instance_label"]))[0]
    assert marker.sum() > 0
    assert (marker.astype(bool) & ~(labels > 0)).sum() == 0
