"""Capacity segmentation path (pipeline/capacity.py): device-resident
vesselness accumulation -> on-device finalize/threshold/CC, minimal
bytes across the link."""
import numpy as np
import pytest

import jax.numpy as jnp

from nellie_tpu.kernels import frangi as frangi_k
from nellie_tpu.pipeline.capacity import segment_volume
# compile-heavy: runs in the CI tests-slow job, not the fast path
pytestmark = pytest.mark.slow


PARAMS = frangi_k.FrangiParams(sigmas=(0.75, 0.95), spacing=(0.5, 0.2, 0.2),
                               z_ratio=2.5)


def _tube_volume(shape=(24, 64, 64), seed=0):
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
    tube = 800.0 * np.exp(
        -(((z - 12) ** 2) * 0.3 + (y - 32 + 6 * np.sin(x / 8.0)) ** 2 / 2)
        / (2 * 2.0 ** 2))
    return np.clip(tube + rng.normal(100, 5, shape), 0, 65535).astype(np.uint16)


def test_capacity_labels_cover_tube():
    vol = _tube_volume()
    out = segment_volume(vol, PARAMS, min_area=4,
                         max_chunk_voxels=16 * 64 * 64)  # forces >1 window
    labels = out["labels"]
    assert labels.shape == vol.shape
    assert out["n_labels"] >= 1
    # the thin tube segments along the central z slab; corners stay empty
    assert int((labels[9:16] > 0).sum()) > 100
    assert (labels[:4] > 0).sum() == 0 and (labels[-4:] > 0).sum() == 0
    assert out["bytes_up"] > 0 and out["bytes_down"] == labels.nbytes


def test_capacity_mask_matches_labels_fg():
    vol = _tube_volume()
    full = segment_volume(vol, PARAMS, min_area=4,
                          max_chunk_voxels=16 * 64 * 64)
    packed = segment_volume(vol, PARAMS, min_area=4, emit="mask",
                            max_chunk_voxels=16 * 64 * 64)
    bits = np.unpackbits(packed["mask_packed"], axis=-1).astype(bool)
    np.testing.assert_array_equal(bits, full["labels"] > 0)
    assert packed["fg_count"] == int((full["labels"] > 0).sum())
    # the bit-packed product is 8x smaller than a bool mask, 16x smaller
    # than uint16 labels
    assert packed["bytes_down"] * 16 == full["bytes_down"]


def test_capacity_float32_buffer_close_to_chunked_filter():
    """With a float32 accumulation buffer the capacity path's mask must
    agree closely with the classic chunked-Filter + Label composition
    (window-global thresholds make both paths tiling-dependent; compare
    foreground IoU)."""
    from nellie_tpu.kernels.ccl import label as ccl_label

    vol = _tube_volume()
    out = segment_volume(vol, PARAMS, min_area=4, vessel_dtype=jnp.float32,
                         max_chunk_voxels=16 * 64 * 64)
    f16 = segment_volume(vol, PARAMS, min_area=4, vessel_dtype=jnp.float16,
                         max_chunk_voxels=16 * 64 * 64)
    fg32 = out["labels"] > 0
    fg16 = f16["labels"] > 0
    iou = (fg32 & fg16).sum() / max(1, (fg32 | fg16).sum())
    assert iou > 0.98  # f16 quantisation moves at most boundary voxels


def test_capacity_sparse_labels_match_dense():
    """emit="sparse_labels" reconstructs the exact dense label image with
    ~8x fewer downlink bytes."""
    vol = _tube_volume()
    dense = segment_volume(vol, PARAMS, min_area=4,
                           max_chunk_voxels=16 * 64 * 64)
    sparse = segment_volume(vol, PARAMS, min_area=4, emit="sparse_labels",
                            max_chunk_voxels=16 * 64 * 64)
    np.testing.assert_array_equal(sparse["labels"], dense["labels"])
    assert sparse["fg_count"] == int((dense["labels"] > 0).sum())
    assert sparse["bytes_down"] < dense["bytes_down"] / 4


def test_capacity_segment_path_writes_artifact(tmp_path):
    """segment_path: OME volume in -> labels artifact out, loadable via
    the standard ImInfo surface."""
    from nellie_tpu.io import ome as ome_mod
    from nellie_tpu.io import tiff
    from nellie_tpu.pipeline.capacity import segment_path

    vol = _tube_volume()
    desc = ome_mod.build_ome_xml("ZYX", vol.shape, "uint16",
                                 dim_res={"X": 0.2, "Y": 0.2, "Z": 0.5})
    p = tmp_path / "big.ome.tif"
    tiff.imwrite(p, vol, description=desc)
    out = segment_path(p, max_chunk_voxels=16 * 64 * 64,
                       sigmas=(0.75, 0.95))
    assert out["n_labels"] >= 1
    im_info = out["im_info"]
    written = np.asarray(im_info.get_memmap(
        im_info.pipeline_paths["im_instance_label"]))
    np.testing.assert_array_equal(written.reshape(vol.shape), out["labels"])
