"""Compile-warmer tests: shadow data is shape-true and the warm threads
run real stages end-to-end without touching the caller's dataset."""
import numpy as np
import pytest

from nellie_tpu.pipeline.warmup import PipelineWarmer, synthesize_shadow
# compile-heavy: runs in the CI tests-slow job, not the fast path
pytestmark = pytest.mark.slow



def test_synthesize_shadow_shapes(tmp_path):
    im_info = synthesize_shadow(str(tmp_path), (12, 48, 48),
                                {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 1.0},
                                no_z=False, no_t=False)
    assert im_info.axes == "TZYX"
    assert im_info.shape == (2, 12, 48, 48)
    labels = np.asarray(im_info.get_memmap(
        im_info.pipeline_paths["im_instance_label"]))
    assert labels.shape == (2, 12, 48, 48)
    assert labels.max() >= 1  # non-degenerate: labels exist
    skel = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_skel"]))
    assert (skel > 0).any()
    flow = np.load(im_info.pipeline_paths["flow_vector_array"])
    assert flow.ndim == 2 and flow.shape[1] == 8  # 3D row format
    # skeleton voxels sit inside their label's mask
    on = skel > 0
    assert (labels[on] == skel[on]).all()


def test_synthesize_shadow_2d_no_t(tmp_path):
    im_info = synthesize_shadow(str(tmp_path), (48, 64),
                                {"X": 0.2, "Y": 0.2},
                                no_z=True, no_t=True)
    assert im_info.no_z and im_info.no_t
    labels = np.asarray(im_info.get_memmap(
        im_info.pipeline_paths["im_instance_label"]))
    assert labels.max() >= 1


def test_warmer_runs_stage_and_cleans_up(tmp_path):
    src = synthesize_shadow(str(tmp_path), (8, 48, 48),
                            {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 1.0},
                            no_z=False, no_t=False)
    w = PipelineWarmer(src, device="cpu", stages=("label",))
    assert w.frame_shape == (8, 48, 48)
    assert w.start()
    for t in w._threads:
        t.join(timeout=300)
    assert w._pending == 0
    root = w.root
    w.finish()
    import os

    assert not os.path.exists(root)


def test_warmer_skips_oversized_frames(tmp_path):
    src = synthesize_shadow(str(tmp_path), (8, 48, 48),
                            {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 1.0},
                            no_z=False, no_t=False)
    w = PipelineWarmer(src, device="cpu")
    w.frame_shape = (1024, 1024, 1024)
    assert not w.applicable()
    assert not w.start()


def test_warmer_runs_once_per_shape(tmp_path):
    """A second warmer for the same frame shape must be a no-op: the
    programs are already in the executable cache, and shadow compute
    would otherwise compete with the real (warm) pipeline run."""
    from nellie_tpu.pipeline import warmup

    src = synthesize_shadow(str(tmp_path), (8, 40, 40),
                            {"X": 0.2, "Y": 0.2, "Z": 0.5, "T": 1.0},
                            no_z=False, no_t=False)
    warmup._WARMED_SHAPES.discard(((8, 40, 40), False, False))
    w1 = PipelineWarmer(src, device="cpu", stages=("label",))
    assert w1.start()
    for t in w1._threads:
        t.join(timeout=300)
    w1.finish()
    w2 = PipelineWarmer(src, device="cpu", stages=("label",))
    assert not w2.applicable()
    assert not w2.start()
