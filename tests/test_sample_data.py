"""The sample-data generator produces a valid, segmentable input
(the role of the reference's ``sample_data/yeast_3d_mitochondria.ome.tif``,
which is stripped from the mirror)."""
import numpy as np
import pytest

from nellie_tpu.io.verifier import FileInfo, ImInfo
from nellie_tpu.stages.filtering import Filter
from nellie_tpu.stages.labelling import Label
from scripts.make_sample_data import write_sample
# compile-heavy: runs in the CI tests-slow job, not the fast path
pytestmark = pytest.mark.slow



def test_sample_data_roundtrip_and_segment(tmp_path):
    path = str(tmp_path / "sample.ome.tif")
    write_sample(path, shape=(2, 8, 64, 64))

    fi = FileInfo(path)
    fi.find_metadata()
    fi.load_metadata()
    assert fi.axes == "TZYX"
    assert fi.shape == (2, 8, 64, 64)
    assert fi.dim_res == {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 2.0}
    assert fi.get_validation_errors() == []

    im_info = ImInfo(fi)
    Filter(im_info).run()
    Label(im_info).run()
    labels = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_instance_label"]))
    assert labels.max() >= 1  # tubules found
    assert labels.shape == (2, 8, 64, 64)


def test_sample_data_deterministic(tmp_path):
    a = str(tmp_path / "a.ome.tif")
    b = str(tmp_path / "b.ome.tif")
    write_sample(a, shape=(1, 8, 32, 32))
    write_sample(b, shape=(1, 8, 32, 32))
    assert open(a, "rb").read() == open(b, "rb").read()
