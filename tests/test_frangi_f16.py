"""float16 cascade-carry narrowing (FrangiParams.carry_dtype).

The opt-in f16 storage path must stay numerically inside the oracle
suite's own tolerances for the default path (fg IoU > 0.95, corr >
0.98 — tests/oracle/test_stage_parity.py): here we hold it to tighter
bounds against the f32 path directly, and require the downstream label
count to be unchanged on the synthetic tube.
"""
import numpy as np
import pytest


def _tube_frame(shape=(12, 48, 48), seed=0, amp=900.0):
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
    tube = amp * np.exp(
        -(((z - shape[0] // 2) ** 2) * 0.25
          + (y - shape[1] // 2 + 6 * np.sin(x / 9.0)) ** 2 / 2) / (2 * 2.2 ** 2))
    return np.clip(tube + rng.normal(100, 5, shape), 0, None).astype(np.float32)


SIGMAS = (0.625, 0.8333333333333334, 1.0416666666666667, 1.25, 1.4583333333333335)
SPACING = (0.5, 0.2, 0.2)


def _params(carry_dtype):
    from nellie_tpu.kernels import frangi as frangi_k

    return frangi_k.FrangiParams(
        sigmas=SIGMAS, spacing=SPACING, z_ratio=2.5, carry_dtype=carry_dtype)


def test_f16_vesselness_close_to_f32():
    import jax.numpy as jnp

    from nellie_tpu.kernels import frangi as frangi_k

    frame = jnp.asarray(_tube_frame())
    v32, m32 = frangi_k.vesselness_frame(frame, _params("float32"))
    v16, m16 = frangi_k.vesselness_frame(frame, _params("float16"))
    v32, v16 = np.asarray(v32), np.asarray(v16)
    assert v16.dtype == np.float32  # storage narrows, the artifact doesn't

    fg32, fg16 = v32 > 0, v16 > 0
    iou = (fg32 & fg16).sum() / max(1, (fg32 | fg16).sum())
    assert iou > 0.98, f"fg IoU {iou:.4f}"
    both = fg32 & fg16
    if both.sum() > 10:
        corr = np.corrcoef(v32[both], v16[both])[0, 1]
        assert corr > 0.995, f"corr {corr:.5f}"


def test_f16_label_count_matches_f32():
    import jax.numpy as jnp

    from nellie_tpu.mesh.sharded import _segment_step

    frame = jnp.asarray(_tube_frame())
    _, l32, n32 = _segment_step(frame, _params("float32"), 4)
    _, l16, n16 = _segment_step(frame, _params("float16"), 4)
    assert int(n16) == int(n32)
    fg32, fg16 = np.asarray(l32) > 0, np.asarray(l16) > 0
    iou = (fg32 & fg16).sum() / max(1, (fg32 | fg16).sum())
    # boundary voxels shift by ±1 where the response sits exactly at the
    # threshold; 0.95 is the oracle suite's own bar for the f32 path vs
    # scipy (tests/oracle/test_stage_parity.py:62)
    assert iou > 0.95, f"label fg IoU {iou:.4f}"


def test_f16_2d_path():
    import jax.numpy as jnp

    from nellie_tpu.kernels import frangi as frangi_k

    frame2d = jnp.asarray(_tube_frame()[6])
    p32 = frangi_k.FrangiParams(sigmas=SIGMAS, spacing=SPACING[1:],
                                carry_dtype="float32")
    p16 = frangi_k.FrangiParams(sigmas=SIGMAS, spacing=SPACING[1:],
                                carry_dtype="float16")
    v32, _ = frangi_k.vesselness_frame(frame2d, p32)
    v16, _ = frangi_k.vesselness_frame(frame2d, p16)
    v32, v16 = np.asarray(v32), np.asarray(v16)
    fg32, fg16 = v32 > 0, v16 > 0
    iou = (fg32 & fg16).sum() / max(1, (fg32 | fg16).sum())
    assert iou > 0.95, f"2D fg IoU {iou:.4f}"


def test_config_carries_filter_dtype():
    from nellie_tpu.plugin.config import SettingsConfig, preprocessing_params

    cfg = SettingsConfig(preprocessing_carry_dtype="float16")
    assert preprocessing_params(cfg)["carry_dtype"] == "float16"
    # round-trips through json like every other field
    assert SettingsConfig.from_json(cfg.to_json()).preprocessing_carry_dtype == "float16"
