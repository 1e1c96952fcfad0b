"""Batch CLI end-to-end: two files through the full pipeline."""
import os

import numpy as np
import pytest

from nellie_tpu.io import ome as ome_mod
from nellie_tpu.io import tiff as tifffile


@pytest.mark.slow
def test_cli_batch_directory(tmp_path):
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:48, 0:48]
    for name in ("mito_a", "mito_b"):
        line = 700 * np.exp(-((y - 24 + 5 * np.sin(x / 6)) ** 2) / (2 * 2.0**2))
        data = np.clip(line + rng.normal(80, 5, (48, 48)), 0, None).astype(np.uint16)
        desc = ome_mod.build_ome_xml("YX", data.shape, "uint16",
                                     dim_res={"X": 0.1, "Y": 0.1, "Z": None, "T": None})
        tifffile.imwrite(tmp_path / f"{name}.ome.tif", data, description=desc)
    # a non-matching file that must be skipped by the substring filter
    tifffile.imwrite(tmp_path / "er_c.ome.tif", np.zeros((48, 48), np.uint16))

    from nellie_tpu.pipeline.cli import main

    main(["--directory", str(tmp_path), "--substring", "mito", "--timeit"])

    for name in ("mito_a", "mito_b"):
        out_dir = tmp_path / "nellie_output"
        csvs = [f for f in os.listdir(out_dir) if f.startswith(name) and f.endswith("features_organelles.csv")]
        assert csvs, f"no organelle features for {name}"
    # the filtered-out file must not have been processed
    assert not [f for f in os.listdir(tmp_path / "nellie_output") if f.startswith("er_c")]
