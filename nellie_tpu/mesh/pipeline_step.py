"""All seven pipeline stages as one multi-chip jittable step.

The on-disk pipeline (``nellie_tpu/stages``) streams frames through host
artifacts; this module is the pure-device formulation used for
multi-chip execution and the driver's dryrun: a (T, Z, Y, X) batch runs
Filter → Label → Network → Markers frame-parallel over the mesh ``t``
axis and spatially sharded over ``z`` (GSPMD halo exchange for every
stencil, all-reduce for global thresholds), then tracking feature
extraction, frame-to-frame matching, voxel reassignment NN and the
hierarchy's per-label statistics run as fixed-capacity dense kernels
across consecutive frames.

Data-dependent structures (marker sets, foreground voxel lists) become
fixed-capacity ``top_k`` selections with validity masks so the whole
step stays jittable and shardable — the multi-chip analogue of the
reference's per-frame Python loops (``/root/reference/nellie/run.py:54-128``).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nellie_tpu.kernels import frangi as frangi_k
from nellie_tpu.kernels.matching import COST_CUTOFF, pair_costs, pair_stats
from nellie_tpu.kernels.pallas_nn import nn_argmin_xla
from nellie_tpu.kernels.segstats import _segment_nanstats_kernel
from nellie_tpu.kernels.skeleton import skeletonize_2d, skeletonize_3d
from nellie_tpu.mesh.sharded import _segment_step
from nellie_tpu.stages.hu_tracking import _prep_frame_kernel, _roi_features_kernel
from nellie_tpu.stages.mocap_marking import MarkerParams, markers_frame_distance
from nellie_tpu.stages.networking import (
    _add_missing_skeleton_kernel,
    _branch_skel_labels_kernel,
    _clean_skeleton_kernel,
    _pixel_class_kernel,
    _relabel_objects_kernel,
)


@dataclass(frozen=True)
class PipelineStepParams:
    """Static configuration of the dense pipeline step."""

    frangi: frangi_k.FrangiParams
    markers: MarkerParams
    sampling: Tuple[float, ...]          # physical voxel size per axis
    min_area: int = 4
    marker_cap: int = 128                # fixed marker capacity per frame
    voxel_cap: int = 1024                # fixed foreground-voxel capacity
    label_cap: int = 32                  # per-label stats capacity
    roi_r: int = 4                       # tracking ROI cube radius
    max_distance_um: float = 1.0


def _topk_coords(score_flat: jnp.ndarray, shape, k: int):
    """Fixed-capacity coordinate selection: the k highest-scoring voxels
    (ties broken to the lowest flat index) and a validity mask."""
    vals, idx = lax.top_k(score_flat, k)
    coords = jnp.stack(jnp.unravel_index(idx, shape), axis=1).astype(jnp.int32)
    return coords, vals > 0


def _post_segment_frame(frame, vessel, labels, n_labels, p: PipelineStepParams):
    """Stages 3-4 dense + fixed-capacity stage-5/7 per-frame features,
    given the segment step's outputs. Pure function — vmap/shard freely."""
    no_z = frame.ndim == 2
    mask = labels > 0

    # Network (stage 3)
    skel_mask = skeletonize_2d(mask) if no_z else skeletonize_3d(mask)
    skel = jnp.where(skel_mask, labels, 0)
    skel = _clean_skeleton_kernel(skel)
    skel = _add_missing_skeleton_kernel(skel, labels, vessel)
    skel = jnp.where(skel > 0, labels, 0)
    pixel_class = _pixel_class_kernel(skel)
    branch_skel = _branch_skel_labels_kernel(pixel_class)
    branch_labels = _relabel_objects_kernel(branch_skel, labels, p.sampling)

    # Markers (stage 4)
    marker, distance, border = markers_frame_distance(frame, mask, p.markers)

    # stage 5 inputs: fixed-capacity marker set + MXU moment features
    mscore = distance * marker.astype(jnp.float32)
    mcoords, mvalid = _topk_coords(mscore.reshape(-1), frame.shape, p.marker_cap)
    f_log, dil = _prep_frame_kernel(vessel, distance)
    radii = dil[tuple(mcoords.T)]
    pad_i = jnp.pad(frame.astype(jnp.float32), p.roi_r)
    pad_f = jnp.pad(f_log, p.roi_r)
    stats, hu = _roi_features_kernel(
        pad_i, pad_f, mcoords, radii, mvalid, p.roi_r, no_z)

    # stage 6 inputs: fixed-capacity foreground voxel set
    vcoords, vvalid = _topk_coords(mask.astype(jnp.float32).reshape(-1),
                                   frame.shape, p.voxel_cap)

    # stage 7: per-label nan statistics of intensity + structure on device
    seg_ids = jnp.where(labels < p.label_cap, labels, 0)
    seg_ids = jnp.where(mask, seg_ids, 0).reshape(-1).astype(jnp.int32)
    values = jnp.stack([frame.astype(jnp.float32).reshape(-1),
                        vessel.reshape(-1)])
    hier = _segment_nanstats_kernel(values, seg_ids, p.label_cap)  # (5, S, L)

    spacing = jnp.asarray(p.sampling, jnp.float32)
    out = {
        "vessel": vessel,
        "labels": labels,
        "n_labels": n_labels,
        "skel": skel,
        "pixel_class": pixel_class,
        "branch_labels": branch_labels,
        "marker": marker,
        "distance": distance,
        "border": border,
        "marker_coords_phys": mcoords.astype(jnp.float32) * spacing[None],
        "marker_valid": mvalid,
        "marker_stats": stats,
        "marker_hu": hu,
        "voxel_coords_phys": vcoords.astype(jnp.float32) * spacing[None],
        "voxel_valid": vvalid,
        "hier_mean": hier[0],
        "hier_std": hier[1],
    }
    return out


@partial(jax.jit, static_argnames=("p",))
def pipeline_frame_step(frame: jnp.ndarray, p: PipelineStepParams):
    """Single-device convenience: all seven stages' per-frame compute for
    one frame (the e2e steady-state bench kernel)."""
    vessel, labels, n_labels = _segment_step(frame, p.frangi, p.min_area)
    return _post_segment_frame(frame, vessel, labels, n_labels, p)


def _match_pair(coords_post, coords_pre, feats_post, feats_pre,
                valid_post, valid_pre, max_distance):
    """Mutual-best flow vectors between consecutive frames' markers
    (dense z-scored cost, reference ``hu_tracking.py:841-944``)."""
    cnt, s, ss = pair_stats(coords_post, coords_pre, feats_post, feats_pre,
                            valid_post, valid_pre, max_distance)
    cnt = jnp.maximum(cnt, 1.0)
    mean = s / cnt
    std = jnp.sqrt(jnp.maximum(ss / cnt - mean * mean, 0.0)) + 1e-8
    n_stats = 4
    rmv, rmi, _, _ = pair_costs(coords_post, coords_pre, feats_post, feats_pre,
                                valid_post, valid_pre, max_distance,
                                mean, std, n_stats)
    ok = rmv < COST_CUTOFF
    vec = coords_post - coords_pre[rmi]
    return jnp.where(ok[:, None], vec, jnp.nan), ok


def _build_batch_step(p: PipelineStepParams, mesh: Mesh, shard_z: bool):
    """Two-phase sharding: the wide-stencil segment phase (Frangi
    cascade + Hessian + thresholds + CC) runs (t, z)-sharded — few, wide
    halo exchanges amortise well over ICI — then the batch reshards to
    frame-parallel P('t') for the iterative fixpoint stages (thinning,
    JFA, marker NMS): their hundreds of sequential sub-iterations would
    be halo-exchange latency-bound under spatial sharding, so
    data-parallel-by-frame is the faster layout for them."""

    def step(batch):
        spec_tz = [None] * batch.ndim
        spec_tz[0] = "t"
        if shard_z:
            spec_tz[1] = "z"
        batch = lax.with_sharding_constraint(batch, NamedSharding(mesh, P(*spec_tz)))
        vessel, labels, n_labels = jax.vmap(
            lambda f: _segment_step(f, p.frangi, p.min_area))(batch)

        t_only = NamedSharding(mesh, P("t"))
        batch_t = lax.with_sharding_constraint(batch, t_only)
        vessel = lax.with_sharding_constraint(vessel, t_only)
        labels = lax.with_sharding_constraint(labels, t_only)

        per = jax.vmap(
            lambda f, v, l, n: _post_segment_frame(f, v, l, n, p))(
            batch_t, vessel, labels, n_labels)

        # stage 5: match markers of frame t -> t+1 (vmap over frame pairs)
        feats = jnp.concatenate([per["marker_stats"], per["marker_hu"]], axis=2)
        flow_vec, flow_ok = jax.vmap(
            lambda cpo, cpr, fpo, fpr, vpo, vpr: _match_pair(
                cpo, cpr, fpo, fpr, vpo, vpr,
                jnp.float32(p.max_distance_um)))(
            per["marker_coords_phys"][1:], per["marker_coords_phys"][:-1],
            feats[1:], feats[:-1],
            per["marker_valid"][1:], per["marker_valid"][:-1])

        # stage 6: nearest-voxel matching t -> t+1 (MXU dot-trick argmin)
        far = 1e6
        vc = jnp.where(per["voxel_valid"][..., None],
                       per["voxel_coords_phys"], far)
        nn_d, nn_i = jax.vmap(nn_argmin_xla)(vc[:-1], vc[1:])

        return {
            "labels": per["labels"],
            "n_labels": per["n_labels"],
            "skel": per["skel"],
            "branch_labels": per["branch_labels"],
            "marker": per["marker"],
            "flow_vec": flow_vec,
            "flow_ok": flow_ok,
            "nn_dist": nn_d,
            "nn_idx": nn_i,
            "hier_mean": per["hier_mean"],
            "hier_std": per["hier_std"],
        }

    return step


def full_pipeline_step(batch, p: PipelineStepParams, mesh: Mesh):
    """Run the complete dense pipeline over a (T, *spatial) batch sharded
    (t = data parallel; z = spatial parallel for the segment phase).
    Returns a host-side dict of numpy arrays."""
    batch = jnp.asarray(batch, jnp.float32)
    shard_z = (mesh.shape.get("z", 1) > 1
               and batch.ndim >= 2
               and batch.shape[1] % mesh.shape["z"] == 0)
    spec = [None] * batch.ndim
    spec[0] = "t"
    if shard_z:
        spec[1] = "z"
    in_sharding = NamedSharding(mesh, P(*spec))
    fn = jax.jit(_build_batch_step(p, mesh, shard_z), in_shardings=in_sharding)
    out = fn(jax.device_put(batch, in_sharding))
    return {k: np.asarray(v) for k, v in out.items()}


def default_step_params(spacing=(0.5, 0.2, 0.2), no_z=False,
                        sigmas=(0.75, 0.95), **kw) -> PipelineStepParams:
    z_ratio = float(spacing[0]) / float(spacing[-1]) if not no_z else 1.0
    return PipelineStepParams(
        frangi=frangi_k.FrangiParams(
            sigmas=tuple(sigmas), spacing=tuple(spacing), z_ratio=z_ratio),
        markers=MarkerParams(
            sigmas=tuple(sigmas), z_ratio=z_ratio, max_radius_px=5.0,
            peak_min_distance=1, no_z=no_z),
        sampling=tuple(spacing),
        **kw,
    )
