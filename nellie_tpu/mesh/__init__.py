"""Device-mesh scaling: sharded pipeline steps over TPU pods.

The reference scales by halo-padded host chunk loops and per-file batch
loops (SURVEY.md §2.4); here the same math scales across chips:

* spatial axis (the sequence-parallel analog): the volume's Z axis is
  sharded across the mesh; the stencil kernels (Gaussian cascade,
  Hessian, rank filters) are expressed as pad+shift dense ops, which XLA
  GSPMD partitions with automatic ICI halo exchange, and the histogram /
  threshold reductions become global collectives — so the sharded result
  matches the single-chip result (no per-chunk statistics drift, unlike
  the host-chunked fallback).
* batch axis (data parallel): independent timepoints/files shard across
  the remaining mesh axis.

Entry points: :func:`make_mesh`, :func:`shard_volume`,
:func:`sharded_segment_step`.
"""
from nellie_tpu.mesh.sharded import (  # noqa: F401
    make_hybrid_mesh,
    make_mesh,
    shard_volume,
    sharded_segment_step,
    sharded_vesselness,
)
