"""Sharded (multi-chip) execution of the segmentation compute path.

Design: the per-frame kernels in ``nellie_tpu.kernels`` are pure dense
XLA programs (stencils as pad+shift sums, thresholds as scatter-add
histograms, CCL as a segmented-min-scan fixpoint).  Annotating their
inputs with a ``NamedSharding`` lets XLA GSPMD partition them over the
mesh:

* stencils  -> neighbour halo exchange over ICI (``ppermute`` under the
  hood), with halo = kernel radius per axis
* reductions (min/max/histogram/percentile) -> ``all-reduce``
* CCL segmented scans -> per-shard scans + cross-shard carry exchange
  (associative_scan partitions cleanly; no gathers anywhere)

Mesh axes: ``t`` (data parallel over frames/files) x ``z`` (spatial).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nellie_tpu.kernels import ccl
from nellie_tpu.kernels import frangi as frangi_k
from nellie_tpu.kernels import thresholds as thr_k
from nellie_tpu.kernels.filters import uniform_filter


def make_mesh(n_devices: Optional[int] = None, t_axis: int = 1) -> Mesh:
    """Mesh over (t, z): ``t_axis`` data-parallel groups, rest spatial."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % t_axis != 0:
        t_axis = 1
    grid = devices.reshape(t_axis, n_devices // t_axis)
    return Mesh(grid, ("t", "z"))


def frame_sharding(mesh: Mesh, shape=None) -> NamedSharding:
    """Sharding for one (Z,Y,X) / (Y,X) frame over the mesh's "z" axis.

    Picks the first spatial axis whose extent divides the mesh's "z"
    size (Z first, then Y, X); if no axis divides — or no shape is
    given and P("z") would fail — falls back to full replication,
    which is still correct, just unsharded.  Used by the Filter/Label
    stages' ``mesh=`` path (pipeline/run.py)."""
    if "z" not in mesh.shape:
        raise ValueError(
            f"mesh must have a 'z' axis (got axes {tuple(mesh.shape)}); "
            "build one with nellie_tpu.mesh.make_mesh()")
    n = mesh.shape["z"]
    if shape is not None:
        for axis, extent in enumerate(shape):
            if extent % n == 0:
                spec = [None] * len(shape)
                spec[axis] = "z"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P("z"))


def shard_volume(volume: jnp.ndarray, mesh: Mesh, batched: bool = False):
    """Place a (Z,Y,X) or (T,Z,Y,X) volume with Z sharded over the mesh."""
    if batched:
        spec = P("t", "z")
    else:
        spec = P("z")
    return jax.device_put(volume, NamedSharding(mesh, spec))


@partial(jax.jit, static_argnames=("params", "min_area"))
def _segment_step(frame, params: frangi_k.FrangiParams, min_area: int):
    """Frangi vesselness -> global log-domain threshold -> CC labels.

    One frame of the Filter+Label compute path as a single XLA program;
    under GSPMD sharding all reductions are global, so sharded == single
    chip (up to float reduction order).
    """
    vessel, _ = frangi_k.vesselness_frame(frame, params)
    flat = vessel.reshape(-1)
    # strided threshold sample (<= max_threshold_samples values) — the
    # production Label stage's semantics (labelling.py:385-438), and
    # ~50 ms cheaper than full-volume histograms at bench size
    step = max(int(flat.shape[0]) // max(1, params.max_threshold_samples), 1)
    sample = flat[::step]
    pos = sample > 0
    logv = jnp.log10(jnp.where(pos, sample, 1.0))
    tri = thr_k.triangle_threshold(logv, pos)
    ots, _ = thr_k.otsu_threshold(logv, pos)
    threshold = jnp.minimum(10.0**tri, 10.0**ots)
    mask = vessel > threshold
    mask = ccl.fill_holes(mask) if frame.ndim == 3 else mask
    mask = ccl.remove_small_components(mask, min_area)
    mask = uniform_filter(mask.astype(jnp.float32), 3) > 0.5
    labels, n = ccl.label(mask)
    return vessel, labels.astype(jnp.int32), n


def batch_sharding(mesh: Mesh, frame_shape) -> NamedSharding:
    """Sharding for a (T, *spatial) frame batch: axis 0 over the mesh's
    "t" axis (data parallel), plus the first spatial axis divisible by
    the "z" extent (halo-exchanged spatial parallel)."""
    spec = [None] * (len(frame_shape) + 1)
    spec[0] = "t"
    n = mesh.shape.get("z", 1)
    if n > 1:
        for axis, extent in enumerate(frame_shape):
            if extent % n == 0:
                spec[axis + 1] = "z"
                break
    return NamedSharding(mesh, P(*spec))


@partial(jax.jit, static_argnames=("params", "apply_mask", "max_samples",
                                   "remove_edges"))
def batched_filter_kernel(frames, params: frangi_k.FrangiParams,
                          apply_mask: bool, max_samples: int,
                          remove_edges: bool):
    """Filter stage over a (T, *spatial) batch: vesselness + finalize
    (+ optional edge removal) vmapped over frames — the driver feeds the
    mesh's 't' axis with real frames (pipeline/run per-T groups,
    pipeline/batch across files)."""

    def one(f):
        v, m = frangi_k.vesselness_frame(f, params, apply_mask=apply_mask)
        if f.ndim == 2:
            blob = frangi_k.log_blobness_2d(f.astype(jnp.float32), m, params)
            v = jnp.maximum(v, jnp.maximum(blob, 0.0))
        if remove_edges:
            v = frangi_k.remove_edges_frame(v)
        return frangi_k.finalize_frame(v, max_samples)

    return jax.vmap(one)(frames)


@partial(jax.jit, static_argnames=("min_area", "fill", "use_intensity"))
def batched_label_kernel(frangi_b, orig_b, intensity_thr_b, frangi_thr_b,
                         valid_b, min_area: int, fill: bool,
                         use_intensity: bool):
    """Label stage over a (T, *spatial) batch with per-frame thresholds;
    frames whose threshold was undefined (no positive sample) get an
    all-background result via a +inf threshold."""
    from nellie_tpu.stages.labelling import _label_frame_kernel

    thr = jnp.where(valid_b, frangi_thr_b, jnp.inf)

    def one(f, o, it, ft):
        return _label_frame_kernel(f, o, it, ft, min_area, fill, use_intensity)

    return jax.vmap(one)(frangi_b, orig_b, intensity_thr_b.astype(jnp.float32),
                         thr.astype(jnp.float32))


@partial(jax.jit, static_argnames=("sampling",))
def batched_network_kernel(labels_b, frangi_b, sampling):
    """Network stage over a (T, *spatial) batch: thinning, clean,
    fill-missing, pixel classes, branch CC, object relabel — vmapped
    per frame so the mesh 't' axis carries (file, t) frame groups
    (VERDICT r3 #8: batch DP past segmentation)."""
    from nellie_tpu.kernels.skeleton import skeletonize_2d, skeletonize_3d
    from nellie_tpu.stages.networking import (
        _add_missing_skeleton_kernel,
        _branch_skel_labels_kernel,
        _clean_skeleton_kernel,
        _pixel_class_kernel,
        _relabel_objects_kernel,
    )

    def one(lab, fr):
        mask = lab > 0
        skel_mask = skeletonize_2d(mask) if lab.ndim == 2 else skeletonize_3d(mask)
        skel = jnp.where(skel_mask, lab, 0)
        skel = _clean_skeleton_kernel(skel)
        skel = _add_missing_skeleton_kernel(skel, lab, fr)
        skel = jnp.where(skel > 0, lab, 0)
        pixel_class = _pixel_class_kernel(skel)
        branch_skel = _branch_skel_labels_kernel(pixel_class)
        branch_labels = _relabel_objects_kernel(branch_skel, lab, sampling)
        return jnp.where(skel > 0, branch_skel, 0), pixel_class, branch_labels

    return jax.vmap(one)(labels_b, frangi_b)


@partial(jax.jit, static_argnames=("params",))
def batched_markers_kernel(intensity_b, labels_b, params):
    """Markers stage (use_im='distance') over a (T, *spatial) batch."""
    from nellie_tpu.stages.mocap_marking import markers_frame_distance

    return jax.vmap(
        lambda i, l: markers_frame_distance(i, l > 0, params))(
        intensity_b, labels_b)


def sharded_vesselness(volume, params: frangi_k.FrangiParams, mesh: Mesh):
    """Multi-chip vesselness of one (Z,Y,X) frame (Z sharded)."""
    sharded = shard_volume(jnp.asarray(volume, jnp.float32), mesh)
    fn = jax.jit(
        lambda v: frangi_k.vesselness_frame(v, params)[0],
        in_shardings=NamedSharding(mesh, P("z")),
        out_shardings=NamedSharding(mesh, P("z")),
    )
    return fn(sharded)


def sharded_segment_step(
    batch, params: frangi_k.FrangiParams, mesh: Mesh, min_area: int = 4
):
    """The full segment compute step over a (T, Z, Y, X) batch:
    frames shard over the ``t`` mesh axis (data parallel), Z over ``z``
    (spatial parallel with halo exchange)."""
    batch = jnp.asarray(batch, jnp.float32)
    in_sharding = NamedSharding(mesh, P("t", "z"))
    out_sharding = (
        NamedSharding(mesh, P("t", "z")),
        NamedSharding(mesh, P("t", "z")),
        NamedSharding(mesh, P("t")),
    )

    def step(frames):
        return jax.vmap(lambda f: _segment_step(f, params, min_area))(frames)

    fn = jax.jit(step, in_shardings=in_sharding, out_shardings=out_sharding)
    return fn(jax.device_put(batch, in_sharding))


def make_hybrid_mesh(t_axis: Optional[int] = None) -> Mesh:
    """Multi-slice mesh: the batch axis ('t' — frames/files) rides DCN
    across slices, the spatial axis ('z' — halo exchange) stays on ICI
    within each slice (SURVEY §5.8: DCN only for embarrassingly-parallel
    batch sharding; stencil halos must never cross DCN).

    Falls back to :func:`make_mesh` on single-slice or non-TPU backends
    (CPU test meshes have no slice topology).
    """
    devices = jax.devices()
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if None in slice_ids or len(slice_ids) <= 1:
        return make_mesh(t_axis=t_axis or 1)
    n_slices = len(slice_ids)
    per_slice = len(devices) // n_slices
    if t_axis is None:
        t_per_slice = 1
    else:
        if t_axis % n_slices != 0 or per_slice % (t_axis // n_slices) != 0:
            raise ValueError(
                f"t_axis={t_axis} must be a multiple of the slice count "
                f"({n_slices}) and its per-slice share must divide the "
                f"{per_slice} chips per slice")
        t_per_slice = t_axis // n_slices
    from jax.experimental import mesh_utils

    grid = mesh_utils.create_hybrid_device_mesh(
        (t_per_slice, per_slice // t_per_slice), (n_slices, 1), devices)
    return Mesh(grid, ("t", "z"))
