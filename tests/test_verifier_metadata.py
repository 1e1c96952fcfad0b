"""FileInfo/ImInfo metadata tests (mirrors the reference test strategy:
dummy tag/nd2 objects for extraction edge cases, plus real end-to-end
canonicalisation through our own TIFF codec)."""
import numpy as np
import pytest

from nellie_tpu.io import tiff as tifffile
from nellie_tpu.io.verifier import FileInfo, ImInfo


class DummyTag:
    def __init__(self, name, value):
        self.name = name
        self.value = value


class DummyVolume:
    def __init__(self, axes_calibration):
        self.axesCalibration = axes_calibration


class DummyChannel:
    def __init__(self, axes_calibration):
        self.volume = DummyVolume(axes_calibration)


class DummyNd2Metadata:
    def __init__(self, axes_calibration=None, channels=None):
        self.volume = DummyVolume(axes_calibration) if axes_calibration is not None else None
        self.channels = channels or []


@pytest.mark.parametrize(
    ("unit", "expected_scale"),
    [
        (tifffile.RESUNIT.CENTIMETER, 1e4),
        (tifffile.RESUNIT.INCH, 25400),
    ],
)
def test_tif_tag_resolution_unit_scaling(tmp_path, unit, expected_scale):
    file_info = FileInfo(str(tmp_path / "dummy.tif"))
    file_info.axes = "YX"
    file_info.dim_res = {"X": None, "Y": None, "Z": None, "T": None}

    metadata = {
        282: DummyTag("XResolution", (2, 1)),
        283: DummyTag("YResolution", (4, 1)),
        296: DummyTag("ResolutionUnit", unit),
    }
    file_info._get_tif_tags_metadata(metadata)

    assert file_info.dim_res["X"] == pytest.approx((1 / 2) * expected_scale)
    assert file_info.dim_res["Y"] == pytest.approx((1 / 4) * expected_scale)


def test_nd2_time_increment_uses_median_diff(tmp_path):
    file_info = FileInfo(str(tmp_path / "dummy.nd2"))
    file_info.axes = "TZYX"
    file_info.dim_res = {"X": None, "Y": None, "Z": None, "T": None}

    timestamps = [0.0, 1.0, 2.2, 3.1]
    metadata = {
        "root": DummyNd2Metadata(axes_calibration=[0.2, 0.2, 0.5]),
        "recorded_data": {"Time [s]": timestamps},
    }
    file_info._get_nd2_metadata(metadata)

    assert file_info.dim_res["T"] == pytest.approx(np.median(np.diff(timestamps)))
    assert file_info.dim_res["X"] == pytest.approx(0.2)
    assert file_info.dim_res["Z"] == pytest.approx(0.5)


def test_nd2_single_timepoint_gives_none(tmp_path):
    file_info = FileInfo(str(tmp_path / "dummy.nd2"))
    file_info.axes = "TYX"
    file_info.dim_res = {"X": None, "Y": None, "Z": None, "T": None}
    metadata = {
        "root": DummyNd2Metadata(axes_calibration=[0.2, 0.2, 0.5]),
        "recorded_data": {"Time [s]": [0.0]},
    }
    file_info._get_nd2_metadata(metadata)
    assert file_info.dim_res["T"] is None


def test_nd2_axes_calibration_fallback_to_channel(tmp_path):
    file_info = FileInfo(str(tmp_path / "dummy.nd2"))
    file_info.axes = "ZYX"
    file_info.dim_res = {"X": None, "Y": None, "Z": None, "T": None}
    metadata = {
        "root": DummyNd2Metadata(channels=[DummyChannel([0.1, 0.2, 0.3])]),
        "recorded_data": {},
    }
    file_info._get_nd2_metadata(metadata)
    assert file_info.dim_res["X"] == pytest.approx(0.1)
    assert file_info.dim_res["Y"] == pytest.approx(0.2)
    assert file_info.dim_res["Z"] == pytest.approx(0.3)


def test_change_dim_res_invalid_dimension_raises(tmp_path):
    file_info = FileInfo(str(tmp_path / "dummy.tif"))
    file_info.dim_res = {"X": None, "Y": None, "Z": None, "T": None}
    with pytest.raises(ValueError, match="Invalid dimension"):
        file_info.change_dim_res("Q", 1.0)


def test_select_temporal_range_requires_t_axis(tmp_path):
    file_info = FileInfo(str(tmp_path / "dummy.tif"))
    file_info.axes = "YX"
    file_info.shape = (2, 2)
    with pytest.raises(KeyError, match="No time dimension"):
        file_info.select_temporal_range(0, 1)


def test_validate_preserves_time_range(tmp_path):
    file_info = FileInfo(str(tmp_path / "dummy.tif"))
    file_info.axes = "TYX"
    file_info.shape = (5, 2, 2)
    file_info.dim_res = {"X": 1.0, "Y": 1.0, "Z": None, "T": 1.0}
    file_info.t_start = 1
    file_info.t_end = 3
    file_info._validate()
    assert file_info.t_start == 1
    assert file_info.t_end == 3


# -- end-to-end canonicalisation through the real codec -----------------------

def _write_ome_input(tmp_path, shape, axes, dim_res, dtype=np.uint16, seed=0):
    rng = np.random.default_rng(seed)
    data = (rng.random(shape) * 1000).astype(dtype)
    path = tmp_path / "input.ome.tif"
    from nellie_tpu.io import ome as ome_mod

    desc = ome_mod.build_ome_xml(axes, shape, np.dtype(dtype).name, dim_res=dim_res)
    tifffile.imwrite(path, data, description=desc)
    return path, data


def test_iminfo_full_canonicalisation_3d_t(tmp_path):
    dim_res = {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 1.5}
    path, data = _write_ome_input(tmp_path, (3, 4, 16, 17), "TZYX", dim_res)

    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    assert fi.metadata_type == "ome"
    assert fi.axes == "TZYX"
    assert fi.good_axes and fi.good_dims
    assert fi.dim_res["Z"] == pytest.approx(0.5)

    im_info = ImInfo(fi)
    assert im_info.axes == "TZYX"
    assert im_info.shape == (3, 4, 16, 17)
    assert not im_info.no_z and not im_info.no_t
    np.testing.assert_array_equal(np.asarray(im_info.im), data)
    assert len(im_info.pipeline_paths) == 18  # 17 artifacts + ...
    for key in (
        "im_preprocessed", "im_instance_label", "im_skel", "im_skel_relabelled",
        "im_pixel_class", "im_marker", "im_distance", "im_border",
        "flow_vector_array", "voxel_matches", "im_branch_label_reassigned",
        "im_obj_label_reassigned", "features_voxels", "features_nodes",
        "features_branches", "features_organelles", "features_image",
        "adjacency_maps",
    ):
        assert key in im_info.pipeline_paths


def test_iminfo_singleton_z_squeeze(tmp_path):
    dim_res = {"X": 0.1, "Y": 0.1, "Z": 0.5, "T": 1.0}
    path, data = _write_ome_input(tmp_path, (2, 1, 8, 9), "TZYX", dim_res)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    im_info = ImInfo(fi)
    assert im_info.axes == "TYX"
    assert im_info.no_z and not im_info.no_t
    assert im_info.shape == (2, 8, 9)


def test_iminfo_no_t_gets_added(tmp_path):
    dim_res = {"X": 0.1, "Y": 0.1, "Z": 0.5, "T": None}
    path, data = _write_ome_input(tmp_path, (4, 8, 9), "ZYX", dim_res)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    im_info = ImInfo(fi)
    assert im_info.axes == "TZYX"
    assert im_info.shape == (1, 4, 8, 9)
    assert im_info.no_t and not im_info.no_z


def test_iminfo_temporal_range_and_channel(tmp_path):
    dim_res = {"X": 0.1, "Y": 0.1, "Z": None, "T": 1.0}
    rng = np.random.default_rng(7)
    data = (rng.random((5, 2, 8, 9)) * 1000).astype(np.uint16)
    from nellie_tpu.io import ome as ome_mod

    path = tmp_path / "multi_ch.ome.tif"
    desc = ome_mod.build_ome_xml("TCYX", data.shape, "uint16", dim_res=dim_res)
    tifffile.imwrite(path, data, description=desc)

    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    assert fi.axes == "TCYX"
    fi.change_selected_channel(1)
    fi.select_temporal_range(1, 3)
    im_info = ImInfo(fi)
    assert im_info.axes == "TYX"
    assert im_info.shape == (3, 8, 9)
    np.testing.assert_array_equal(np.asarray(im_info.im), data[1:4, 1])


def test_allocate_memory_roundtrip(tmp_path):
    dim_res = {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 1.5}
    path, _ = _write_ome_input(tmp_path, (2, 4, 8, 9), "TZYX", dim_res)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    im_info = ImInfo(fi)

    out = im_info.pipeline_paths["im_preprocessed"]
    mm = im_info.allocate_memory(out, dtype="float", description="frangi", return_memmap=True)
    assert mm.shape == im_info.shape
    assert mm.dtype == np.float32
    mm[0, 0, 0, 0] = 3.5
    mm.flush()
    again = im_info.get_memmap(out)
    assert again[0, 0, 0, 0] == 3.5
    # OME metadata carries description + pixel sizes
    from nellie_tpu.io import ome as ome_mod

    meta = ome_mod.from_xml(tifffile.tiffcomment(out))
    assert meta.images[0].description == "frangi"
    assert meta.images[0].pixels.physical_size_z == pytest.approx(0.5)


def test_tif_tag_resolution_guards(tmp_path):
    """ResolutionUnit without X/YResolution, and zero-numerator rationals
    ('unknown' in some writers), must not crash metadata discovery."""
    file_info = FileInfo(str(tmp_path / "dummy.tif"))
    file_info.axes = "YX"
    file_info.dim_res = {"X": None, "Y": None, "Z": None, "T": None}
    # unit tag alone: nothing to scale, no TypeError
    file_info._get_tif_tags_metadata(
        {296: DummyTag("ResolutionUnit", tifffile.RESUNIT.INCH)})
    assert file_info.dim_res["X"] is None

    # zero-numerator rational: left unknown, no ZeroDivisionError
    file_info._get_tif_tags_metadata({
        282: DummyTag("XResolution", (0, 1)),
        283: DummyTag("YResolution", (4, 1)),
        296: DummyTag("ResolutionUnit", tifffile.RESUNIT.CENTIMETER),
    })
    assert file_info.dim_res["X"] is None
    assert file_info.dim_res["Y"] == pytest.approx((1 / 4) * 1e4)


def test_iminfo_single_timepoint_no_regen(tmp_path):
    """A selected range of ONE timepoint reads back without a T axis;
    ImInfo must accept the canonical copy instead of rewriting it on
    every construction."""
    import os

    from nellie_tpu.io import ome as ome_mod

    data = np.random.default_rng(0).integers(
        0, 1000, (3, 4, 16, 16)).astype(np.uint16)
    desc = ome_mod.build_ome_xml(
        "TZYX", data.shape, "uint16",
        dim_res={"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 1.0})
    path = str(tmp_path / "cells.ome.tif")
    tifffile.imwrite(path, data, description=desc)
    fi = FileInfo(path)
    fi.find_metadata()
    fi.load_metadata()
    fi.select_temporal_range(1, 1)

    im_info = ImInfo(fi)
    canon = im_info.im_path
    mtime = os.path.getmtime(canon)
    im_info2 = ImInfo(fi)
    assert os.path.getmtime(canon) == mtime, "canonical file was rewritten"
    assert im_info2.im_path == canon
