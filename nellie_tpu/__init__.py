"""nellie_tpu — a TPU-native rebuild of the Nellie organelle analysis pipeline.

Nellie (aelefebv/nellie, Nature Methods 2025) is an automated organelle
segmentation, tracking and hierarchical feature extraction pipeline for
2D/3D(+T) live-cell microscopy.  This package re-implements the full
pipeline from scratch for TPU hardware:

* compute path: JAX / XLA / Pallas, jitted per-frame stage functions
  (replaces the reference's numpy<->cupy ``xp``/``ndi`` dispatch,
  ``/root/reference/nellie/__init__.py:4-49``)
* scaling path: ``jax.sharding.Mesh`` + ``shard_map`` halo exchange over
  ICI (replaces the reference's halo-padded host chunk loops)
* IO path: a self-contained BigTIFF/OME-TIFF codec with memmap-backed
  artifact storage (replaces tifffile/ome-types, which the reference uses
  in ``nellie/im_info/verifier.py``)

Layer map:

``nellie_tpu.io``        file metadata, OME-TIFF canonicalisation, artifact store
``nellie_tpu.kernels``   the image-processing primitives as jittable JAX/Pallas ops
``nellie_tpu.stages``    the 7 pipeline stages (Filter, Label, Network, Markers,
                         HuMomentTracking, VoxelReassigner, Hierarchy)
``nellie_tpu.mesh``      device mesh, sharding specs, halo exchange
``nellie_tpu.pipeline``  run()/CLI orchestration
``nellie_tpu.plugin``    napari GUI (gated on napari availability)
"""

__version__ = "0.5.0"

from nellie_tpu.utils.base_logger import logger  # noqa: F401


def device_type() -> str:
    """Return the primary JAX backend platform ('tpu', 'cpu', ...)."""
    import jax

    return jax.devices()[0].platform


def is_tpu() -> bool:
    import jax

    return any(d.platform == "tpu" for d in jax.devices())
