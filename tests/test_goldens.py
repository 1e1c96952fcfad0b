"""Golden-output regression: a seeded synthetic dataset's pipeline outputs
must stay behaviourally stable across rounds (tolerant float goldens;
exact structural goldens)."""
import numpy as np
import pandas as pd
import pytest

from nellie_tpu.io import ome as ome_mod
from nellie_tpu.io import tiff as tifffile
from nellie_tpu.io.verifier import FileInfo
# compile-heavy: runs in the CI tests-slow job, not the fast path
pytestmark = pytest.mark.slow



GOLDEN_FG_TOTAL = 881
GOLDEN_ORG_AREA = 17.62
GOLDEN_VOX_ROWS = 881
GOLDEN_VOX_INTENSITY = 660.69


@pytest.fixture(scope="module")
def golden_run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("golden")
    shape = (2, 12, 48, 48)
    rng = np.random.default_rng(123)
    z, y, x = np.mgrid[0 : shape[1], 0 : shape[2], 0 : shape[3]]
    frames = []
    for t in range(2):
        tube = 900.0 * np.exp(
            -(((z - 6) ** 2) * 0.25 + (y - 24 - t + 6 * np.sin(x / 9.0)) ** 2 / 2)
            / (2 * 2.2**2))
        frames.append(np.clip(tube + rng.normal(100, 5, shape[1:]), 0, None))
    data = np.stack(frames).astype(np.uint16)
    desc = ome_mod.build_ome_xml("TZYX", shape, "uint16",
                                 dim_res={"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 2.0})
    path = tmp_path / "golden.ome.tif"
    tifffile.imwrite(path, data, description=desc)
    fi = FileInfo(str(path))
    fi.find_metadata()
    fi.load_metadata()
    from nellie_tpu.pipeline.run import run

    return run(fi)


def test_golden_segmentation(golden_run):
    labels = np.asarray(golden_run.get_memmap(golden_run.pipeline_paths["im_instance_label"]))
    n_per_frame = [len(np.unique(labels[t])) - 1 for t in range(2)]
    fg_per_frame = [(labels[t] > 0).sum() for t in range(2)]
    # structural goldens (recorded 2026-08-16, round 1)
    assert n_per_frame == [5, 5], n_per_frame
    assert sum(fg_per_frame) == pytest.approx(GOLDEN_FG_TOTAL, rel=0.1), fg_per_frame


def test_golden_skeleton(golden_run):
    skel = np.asarray(golden_run.get_memmap(golden_run.pipeline_paths["im_skel"]))
    vox = [(skel[t] > 0).sum() for t in range(2)]
    # exact voxel counts (thinning is deterministic; recorded round 2 with
    # the packed backend, identical to the round-1 arith backend)
    assert vox == [23, 18], vox
    rel = np.asarray(golden_run.get_memmap(golden_run.pipeline_paths["im_skel_relabelled"]))
    labels = np.asarray(golden_run.get_memmap(golden_run.pipeline_paths["im_instance_label"]))
    assert (rel[labels > 0] > 0).all()


def test_golden_tracking(golden_run):
    flow = np.load(golden_run.pipeline_paths["flow_vector_array"])
    assert flow.shape[1] == 8
    assert flow.shape[0] == pytest.approx(20, abs=8), flow.shape
    # tube moved -1 voxel in y per frame... cy = 24 + t -> +1 in y
    assert np.median(flow[:, 5]) == pytest.approx(1, abs=1.0)


def test_golden_features(golden_run):
    org = pd.read_csv(golden_run.pipeline_paths["features_organelles"])
    assert len(org) == 10  # five organelles per frame
    assert org["organelle_area_raw"].sum() == pytest.approx(GOLDEN_ORG_AREA, rel=0.15)
    vox = pd.read_csv(golden_run.pipeline_paths["features_voxels"])
    assert len(vox) == pytest.approx(GOLDEN_VOX_ROWS, rel=0.1)
    assert vox["intensity_raw"].mean() == pytest.approx(GOLDEN_VOX_INTENSITY, rel=0.2)
