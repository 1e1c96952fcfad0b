"""Chunked capacity strategy (pipeline/capacity.py): per-grid-cell CCL +
host union-find over boundary planes must reproduce the monolithic
whole-volume program EXACTLY — same mask decisions, same scipy-ordered
label numbering (reference semantics: scipy.ndimage.label /
binary_fill_holes as used by /root/reference/nellie/segmentation/
labelling.py:489-507)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nellie_tpu.kernels import frangi as frangi_k
from nellie_tpu.pipeline import capacity

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


def _blob_mask(shape=(20, 40, 48), seed=1, thresh=0.8):
    """Random blobby mask with many components, holes, and specks."""
    rng = np.random.default_rng(seed)
    noise = rng.normal(size=shape)
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(noise, 2.0) > thresh * gaussian_filter(noise, 2.0).std()


def _tiny_grid(shape, n=3):
    """A deliberately fine grid so every merge path is exercised."""
    return [tuple(int(round(d * i / n)) for i in range(n + 1)) for d in shape]


# -- unit: chunked CCL pieces vs scipy ---------------------------------------

def test_chunked_label_matches_scipy():
    from scipy import ndimage

    mask = _blob_mask()
    bounds = _tiny_grid(mask.shape)
    labels, n, fg, _ = capacity._label_chunked(jnp.asarray(mask), mask.shape,
                                               bounds)
    ref, ref_n = ndimage.label(mask, structure=np.ones((3, 3, 3)))
    assert n == ref_n
    assert fg == int(mask.sum())
    np.testing.assert_array_equal(labels.astype(np.int64), ref)


def test_chunked_label_2d_matches_scipy():
    from scipy import ndimage

    mask = _blob_mask(shape=(96, 112), seed=3)
    bounds = _tiny_grid(mask.shape, n=4)
    labels, n, fg, _ = capacity._label_chunked(jnp.asarray(mask), mask.shape,
                                               bounds)
    ref, ref_n = ndimage.label(mask, structure=np.ones((3, 3)))
    assert n == ref_n
    np.testing.assert_array_equal(labels.astype(np.int64), ref)


def test_chunked_label_widens_past_uint16():
    """>65535 components must widen the host assembly to int32 with
    exact scipy numbering — not wrap (round-3 error path retired)."""
    from scipy import ndimage

    mask = np.zeros((32, 128, 128), bool)
    mask[::2, ::2, ::2] = True  # 16*64*64 = 65536 isolated voxels
    bounds = _tiny_grid(mask.shape)
    labels, n, fg, _ = capacity._label_chunked(jnp.asarray(mask), mask.shape,
                                               bounds)
    assert n == 65536
    assert labels.dtype == np.int32
    assert fg == int(mask.sum())
    ref, ref_n = ndimage.label(mask, structure=np.ones((3, 3, 3)))
    assert ref_n == n
    np.testing.assert_array_equal(labels.astype(np.int64), ref)


def test_chunked_fill_holes_matches_scipy():
    from scipy import ndimage

    # solid shells with interior holes straddling the grid cuts
    mask = np.zeros((24, 30, 36), bool)
    mask[4:20, 5:25, 6:30] = True
    mask[8:16, 9:21, 10:26] = False  # big hole crossing cell boundaries
    mask[2, 2, 2] = True
    mask[22, 2, 30:34] = True
    bounds = _tiny_grid(mask.shape)
    out, _, _ = capacity._fill_holes_chunked(jnp.asarray(mask), mask.shape,
                                             bounds)
    ref = ndimage.binary_fill_holes(mask)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_chunked_remove_small_global_matches_reference():
    from nellie_tpu.kernels import ccl

    mask = _blob_mask(seed=5, thresh=1.1)
    bounds = _tiny_grid(mask.shape)
    out, _, _ = capacity._remove_small_chunked(jnp.asarray(mask), mask.shape,
                                               bounds, 9)
    ref = ccl.remove_small_components(jnp.asarray(mask), 9)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


# -- end-to-end: chunked strategy == monolith strategy ------------------------

def test_chunked_segment_equals_monolith():
    vol = _tube_volume()
    kw = dict(min_area=4, max_chunk_voxels=16 * 64 * 64)
    mono = capacity.segment_volume(vol, PARAMS, strategy="monolith", **kw)
    # shrink the CCL grid so the 24x64x64 volume really runs multi-cell
    orig = capacity._ccl_grid
    capacity._ccl_grid = lambda shape, **_: _tiny_grid(shape)
    try:
        chunk = capacity.segment_volume(vol, PARAMS, strategy="chunked", **kw)
    finally:
        capacity._ccl_grid = orig
    assert chunk["strategy"] == "chunked"
    assert chunk["n_labels"] == mono["n_labels"]
    np.testing.assert_array_equal(
        chunk["labels"].astype(np.int64), mono["labels"].astype(np.int64))


def test_chunked_mask_emit_equals_monolith():
    vol = _tube_volume(seed=7)
    kw = dict(min_area=4, emit="mask", max_chunk_voxels=16 * 64 * 64)
    mono = capacity.segment_volume(vol, PARAMS, strategy="monolith", **kw)
    orig = capacity._ccl_grid
    capacity._ccl_grid = lambda shape, **_: _tiny_grid(shape)
    try:
        chunk = capacity.segment_volume(vol, PARAMS, strategy="chunked", **kw)
    finally:
        capacity._ccl_grid = orig
    assert chunk["fg_count"] == mono["fg_count"]
    np.testing.assert_array_equal(chunk["mask_packed"], mono["mask_packed"])


def test_mesh_segment_equals_monolith():
    """segment_volume(mesh=) runs the monolith GSPMD-sharded over the
    8-device mesh — boundary planes as ppermute collectives instead of
    the host union-find; labels must be bit-equal to the single-device
    run of the same program.

    The single-device reference uses ONE window (max_chunk_voxels ≥
    volume) so its Frangi cascade is whole-volume, like the mesh path's:
    multi-window accumulation differs from whole-volume at <0.01% of
    voxels near window borders (truncated Gaussian tails), which is a
    windowing property, not a sharding one."""
    from nellie_tpu.mesh import make_mesh

    vol = _tube_volume()  # Z=24 divides the 8-way z axis
    kw = dict(min_area=4, max_chunk_voxels=10 ** 9)
    mono = capacity.segment_volume(vol, PARAMS, strategy="monolith", **kw)
    mesh = make_mesh(8, t_axis=1)
    out = capacity.segment_volume(vol, PARAMS, mesh=mesh, **kw)
    assert out["strategy"] == "mesh" and out["n_devices"] == 8
    assert out["bytes_up"] == vol.nbytes  # raw volume exactly once
    assert out["n_labels"] == mono["n_labels"]
    np.testing.assert_array_equal(
        out["labels"].astype(np.int64), mono["labels"].astype(np.int64))


def test_mesh_segment_mask_emit():
    from nellie_tpu.mesh import make_mesh

    vol = _tube_volume(seed=7)
    kw = dict(min_area=4, emit="mask", max_chunk_voxels=10 ** 9)
    mono = capacity.segment_volume(vol, PARAMS, strategy="monolith", **kw)
    out = capacity.segment_volume(vol, PARAMS, mesh=make_mesh(8, t_axis=1), **kw)
    assert out["fg_count"] == mono["fg_count"]
    np.testing.assert_array_equal(out["mask_packed"], mono["mask_packed"])


def test_auto_strategy_picks_by_volume():
    vol = _tube_volume(shape=(16, 32, 32), seed=2)
    out = capacity.segment_volume(vol, PARAMS, min_area=4,
                                  monolith_max_voxels=8 * 32 * 32)
    assert out["strategy"] == "chunked"
    out2 = capacity.segment_volume(vol, PARAMS, min_area=4)
    assert out2["strategy"] == "monolith"


def test_ccl_grid_cells_bounded():
    bounds = capacity._ccl_grid((1024, 1024, 1024))
    for origin, cshape in capacity._iter_cells(bounds):
        assert max(cshape) <= capacity._CCL_CELL_MAX_DIM
        assert int(np.prod(cshape)) <= capacity._CCL_CELL_MAX_VOX
    covered = np.zeros(3, int)
    # cuts tile each axis exactly
    for ax, cuts in enumerate(bounds):
        assert cuts[0] == 0 and cuts[-1] == 1024
        assert all(b > a for a, b in zip(cuts, cuts[1:]))
