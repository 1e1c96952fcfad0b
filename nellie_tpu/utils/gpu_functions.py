"""Reference-layout alias: histogram thresholds (nellie/utils/gpu_functions.py).

The reference's xp-agnostic otsu/triangle live here; in nellie_tpu the
jittable versions are nellie_tpu.kernels.thresholds.
"""
from nellie_tpu.kernels.thresholds import (  # noqa: F401
    min_triangle_otsu,
    otsu_threshold,
    triangle_threshold,
)
