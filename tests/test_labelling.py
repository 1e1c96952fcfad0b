"""Label stage tests: per-frame numbering, thresholds, chunk-merge parity."""
import numpy as np
import pytest

import jax.numpy as jnp

from nellie_tpu.io import ome as ome_mod
from nellie_tpu.io import tiff as tifffile
from nellie_tpu.io.verifier import FileInfo, ImInfo
from nellie_tpu.stages.labelling import Label, _label_frame_kernel
# compile-heavy: runs in the CI tests-slow job, not the fast path
pytestmark = pytest.mark.slow



def _blob_volume(shape=(12, 48, 48), n_blobs=4, seed=0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    z, y, x = np.mgrid[0 : shape[0], 0 : shape[1], 0 : shape[2]]
    centers = []
    for i in range(n_blobs):
        cz = rng.integers(3, shape[0] - 3)
        cy, cx = rng.integers(8, shape[1] - 8), rng.integers(8, shape[2] - 8)
        centers.append((cz, cy, cx))
        vol += 50.0 * np.exp(-(((z - cz) ** 2) / 4 + ((y - cy) ** 2 + (x - cx) ** 2) / 8))
    return vol, centers


def _make_run(tmp_path, frames_frangi, frames_raw, dim_res, axes):
    desc = ome_mod.build_ome_xml(axes, frames_raw.shape, frames_raw.dtype.name, dim_res=dim_res)
    path = tmp_path / "input.ome.tif"
    tifffile.imwrite(path, frames_raw, description=desc)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    im_info = ImInfo(fi)
    # pre-populate the frangi artifact directly (stage under test is Label)
    im_info.allocate_memory(
        im_info.pipeline_paths["im_preprocessed"], dtype="float",
        data=frames_frangi.astype(np.float32), description="frangi",
    )
    return im_info


def test_label_ids_reset_per_frame(tmp_path):
    v0, _ = _blob_volume(seed=1)
    v1, _ = _blob_volume(seed=2)
    frangi = np.stack([v0, v1])
    raw = (frangi * 10 + 100).astype(np.uint16)
    im_info = _make_run(tmp_path, frangi, raw, {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 1.0}, "TZYX")
    Label(im_info).run()
    labels = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_instance_label"]))
    assert labels.dtype == np.int32
    for t in range(2):
        ids = np.unique(labels[t])
        ids = ids[ids > 0]
        assert ids.size >= 1
        # sequential 1..n numbering restarts each frame
        np.testing.assert_array_equal(ids, np.arange(1, ids.size + 1))


def test_min_area_filter_removes_specks():
    frangi = np.zeros((10, 40, 40), np.float32)
    frangi[4:7, 10:20, 10:20] = 1.0  # big object
    frangi[2, 2, 2] = 1.0            # single-voxel speck
    labels = np.asarray(_label_frame_kernel(
        jnp.asarray(frangi), jnp.asarray(frangi), jnp.float32(0.0), jnp.float32(0.5),
        10, True, False,
    ))
    assert labels[5, 15, 15] > 0
    assert labels[2, 2, 2] == 0


def test_intensity_gating():
    frangi = np.zeros((8, 20, 20), np.float32)
    frangi[2:6, 4:16, 4:16] = 1.0
    raw = np.zeros_like(frangi)
    raw[2:6, 4:10, 4:16] = 100.0  # only half passes the intensity gate
    gated = np.asarray(_label_frame_kernel(
        jnp.asarray(frangi), jnp.asarray(raw), jnp.float32(50.0), jnp.float32(0.5),
        1, True, True,
    ))
    ungated = np.asarray(_label_frame_kernel(
        jnp.asarray(frangi), jnp.asarray(raw), jnp.float32(0.0), jnp.float32(0.5),
        1, True, False,
    ))
    assert (gated > 0).sum() < (ungated > 0).sum()
    assert gated[3, 12, 8] == 0  # outside intensity support


def test_chunked_z_matches_full_volume(tmp_path):
    """Mode parity: chunked-Z + union-find merge == full volume (up to label
    permutation — verify identical partitions)."""
    v0, _ = _blob_volume(shape=(16, 40, 40), n_blobs=5, seed=3)
    frangi = v0[None]
    raw = (frangi * 10 + 100).astype(np.uint16)

    im_info = _make_run(tmp_path, frangi, raw, {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": None}, "TZYX")
    Label(im_info).run()
    full = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_instance_label"])).copy()

    Label(im_info, chunk_z=5).run()
    chunked = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_instance_label"])).copy()

    # per-chunk hole-fill/smooth/area-filter cause small boundary effects
    # (inherent to the chunked algorithm, as in the reference) — demand
    # near-identical foreground and consistent partitions on the overlap
    inter = ((full > 0) & (chunked > 0)).sum()
    union = ((full > 0) | (chunked > 0)).sum()
    assert inter / union > 0.99
    fg = (full > 0) & (chunked > 0)
    pairs = set(zip(full[fg].tolist(), chunked[fg].tolist()))
    assert len(pairs) == len({a for a, _ in pairs}) == len({b for _, b in pairs})


def test_labelling_does_not_mutate_inputs(tmp_path):
    v0, _ = _blob_volume(seed=4)
    frangi = v0[None]
    raw = (frangi * 10 + 100).astype(np.uint16)
    im_info = _make_run(tmp_path, frangi, raw, {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": None}, "TZYX")
    before = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_preprocessed"])).copy()
    Label(im_info, otsu_thresh_intensity=True).run()
    after = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_preprocessed"]))
    np.testing.assert_array_equal(before, after)
