"""Network stage tests: skeleton/pixel-class/branch-label contracts."""
import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from nellie_tpu.io import ome as ome_mod
from nellie_tpu.io import tiff as tifffile
from nellie_tpu.io.verifier import FileInfo, ImInfo
from nellie_tpu.stages.networking import (
    Network,
    _add_missing_skeleton_kernel,
    _clean_skeleton_kernel,
    _pixel_class_kernel,
    _relabel_objects_kernel,
)

# compile-heavy: runs in the CI tests-slow job, not the fast path
pytestmark = pytest.mark.slow


def test_clean_skeleton_removes_multi_label_voxels():
    skel = np.zeros((8, 16, 16), np.int32)
    skel[4, 8, 2:7] = 1
    skel[4, 8, 7] = 2      # voxel of label 2 adjacent to label 1 -> ambiguous
    skel[4, 8, 8:12] = 2
    out = np.asarray(_clean_skeleton_kernel(jnp.asarray(skel)))
    assert out[4, 8, 7] == 0 and out[4, 8, 6] == 0  # both sides of the contact
    assert out[4, 8, 3] == 1 and out[4, 8, 10] == 2


def test_add_missing_skeleton_labels():
    labels = np.zeros((6, 12, 12), np.int32)
    labels[2:5, 2:6, 2:6] = 1
    labels[2:5, 8:11, 8:11] = 2
    skel = np.zeros_like(labels)
    skel[3, 4, 4] = 1  # label 1 has a skeleton voxel, label 2 does not
    frangi = np.random.default_rng(0).random(labels.shape).astype(np.float32)
    frangi[3, 9, 9] = 10.0  # argmax of label 2
    out = np.asarray(_add_missing_skeleton_kernel(
        jnp.asarray(skel), jnp.asarray(labels), jnp.asarray(frangi)))
    assert out[3, 4, 4] == 1
    assert out[3, 9, 9] == 2
    assert (out > 0).sum() == 2


def test_pixel_class_values():
    skel = np.zeros((16, 16), np.int32)
    skel[8, 2:10] = 1          # a line: tips at ends, edges between
    skel[4, 4] = 1             # isolated
    pc = np.asarray(_pixel_class_kernel(jnp.asarray(skel)))
    assert pc[4, 4] == 1       # isolated
    assert pc[8, 2] == 2       # tip
    assert pc[8, 5] == 3       # edge
    # junction: cross shape
    skel2 = np.zeros((16, 16), np.int32)
    skel2[8, 4:13] = 1
    skel2[4:13, 8] = 1
    pc2 = np.asarray(_pixel_class_kernel(jnp.asarray(skel2)))
    assert pc2[8, 8] == 4


def test_relabel_objects_fills_objects():
    labels = np.zeros((24, 24), np.int32)
    labels[4:20, 4:12] = 1
    labels[4:20, 14:22] = 2
    branch = np.zeros_like(labels)
    branch[6, 8] = 5     # branch seed in object 1
    branch[18, 8] = 6    # second branch seed in object 1
    branch[10, 18] = 9   # branch seed in object 2
    out = np.asarray(_relabel_objects_kernel(
        jnp.asarray(branch), jnp.asarray(labels), (1.0, 1.0)))
    assert set(np.unique(out[labels == 1])) == {5, 6}
    assert set(np.unique(out[labels == 2])) == {9}
    assert (out[labels == 0] == 0).all()
    # nearest-seed split: top of object 1 -> 5, bottom -> 6
    assert out[5, 8] == 5 and out[19, 8] == 6


def _make_run(tmp_path, raw, frangi, labels, dim_res, axes):
    desc = ome_mod.build_ome_xml(axes, raw.shape, raw.dtype.name, dim_res=dim_res)
    path = tmp_path / "input.ome.tif"
    tifffile.imwrite(path, raw, description=desc)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    im_info = ImInfo(fi)
    im_info.allocate_memory(im_info.pipeline_paths["im_preprocessed"],
                            dtype="float", data=frangi.astype(np.float32), description="frangi")
    im_info.allocate_memory(im_info.pipeline_paths["im_instance_label"],
                            dtype="int32", data=labels.astype(np.int32), description="labels")
    return im_info


def test_network_stage_end_to_end(tmp_path):
    # two separate tubes -> two skeleton curves, full branch coverage
    z, y, x = np.mgrid[0:12, 0:40, 0:40]
    tube1 = (((z - 4) ** 2) + (y - 10) ** 2) <= 6
    tube2 = (((z - 8) ** 2) + (y - 30) ** 2) <= 6
    labels = np.zeros((12, 40, 40), np.int32)
    labels[tube1] = 1
    labels[tube2] = 2
    frangi = (labels > 0).astype(np.float32)
    raw = (frangi * 500 + 100).astype(np.uint16)

    im_info = _make_run(tmp_path, raw[None], frangi[None], labels[None],
                        {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": None}, "TZYX")
    Network(im_info).run()

    skel = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_skel"]))[0]
    pc = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_pixel_class"]))[0]
    rel = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_skel_relabelled"]))[0]

    assert skel.dtype == np.int32 and pc.dtype == np.uint8 and rel.dtype == np.uint32
    assert (skel > 0).sum() > 0
    # skeleton voxels lie within objects
    assert ((skel > 0) & (labels == 0)).sum() == 0
    # every labelled object has at least one skeleton voxel
    for lab in (1, 2):
        assert (skel[labels == lab] > 0).any()
    # branch labels cover each object's voxels fully
    assert (rel[labels > 0] > 0).all()
    assert (rel[labels == 0] == 0).all()
    # branch labels don't cross objects
    assert set(np.unique(rel[labels == 1])).isdisjoint(set(np.unique(rel[labels == 2])))
    # pixel classes within 0..4
    assert pc.max() <= 4


def test_clean_junctions_collapses_clusters():
    pc = np.zeros((16, 16, 16), np.uint8)
    pc[8, 8, 2:12] = 3
    pc[8, 8, 6] = 4
    pc[8, 8, 7] = 4   # two adjacent junction voxels -> one survives
    pc[8, 7, 6] = 4
    from nellie_tpu.io.verifier import FileInfo
    import types
    fake = types.SimpleNamespace(no_z=False)
    net = Network.__new__(Network)
    net.im_info = fake
    out = net._clean_junctions(pc)
    assert (out == 4).sum() == 1
    assert (out == 3).sum() == (pc == 3).sum() + 2


def test_local_max_peak_helper(tmp_path):
    z, y, x = np.mgrid[0:10, 0:24, 0:24]
    blob = 500 * np.exp(-(((z - 5) ** 2) + (y - 12) ** 2 + (x - 12) ** 2) / 8.0)
    labels = (blob > 50).astype(np.int32)
    im_info = _make_run(tmp_path, (blob[None] + 100).astype(np.uint16),
                        (labels[None]).astype(np.float32), labels[None],
                        {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": None}, "TZYX")
    net = Network(im_info)
    peaks = net._local_max_peak(blob, labels > 0)
    assert len(peaks) >= 1
    # the dominant peak is at the blob center
    d = np.linalg.norm(peaks - np.array([5, 12, 12]), axis=1)
    assert d.min() <= 2
