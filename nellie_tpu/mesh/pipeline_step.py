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
    """Static configuration of the dense pipeline step.

    The caps bound the fixed-capacity dense formulations of the
    data-dependent stages.  :func:`full_pipeline_step` treats them as
    MINIMUMS: the segment + dense phases run first and return the true
    per-frame counts, and the capacity phase compiles with exactly-sized
    (bucketed) tables — overflow re-runs are structurally impossible."""

    frangi: frangi_k.FrangiParams
    markers: MarkerParams
    sampling: Tuple[float, ...]          # physical voxel size per axis
    min_area: int = 4
    marker_cap: int = 512                # fixed marker capacity per frame
    voxel_cap: int = 16384               # fixed foreground-voxel capacity
    label_cap: int = 64                  # per-organelle stats capacity
    branch_cap: int = 128                # per-branch stats capacity
    roi_r: int = 4                       # tracking ROI cube radius
    max_distance_um: float = 1.0
    interp_max_distance_um: float = 1.0  # flow-interp radius (0.5 um x dt)


def _topk_coords(score_flat: jnp.ndarray, shape, k: int):
    """Fixed-capacity coordinate selection: the k highest-scoring voxels
    (ties broken to the lowest flat index) and a validity mask."""
    vals, idx = lax.top_k(score_flat, k)
    coords = jnp.stack(jnp.unravel_index(idx, shape), axis=1).astype(jnp.int32)
    return coords, vals > 0


def _network_markers_frame(frame, vessel, labels, p: PipelineStepParams):
    """Stages 3-4 dense for one frame (no capacities involved).
    Pure function — vmap/shard freely."""
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
    return {
        "skel": skel,
        "pixel_class": pixel_class,
        "branch_labels": branch_labels,
        "marker": marker,
        "distance": distance,
        "border": border,
        "n_fg": jnp.sum(mask).astype(jnp.int32),
        "n_markers": jnp.sum(marker.astype(jnp.int32)),
        "max_branch": jnp.max(branch_labels).astype(jnp.int32),
    }


def _capacity_frame(frame, vessel, labels, n_labels, dense,
                    p: PipelineStepParams):
    """Fixed-capacity stage-5/7 per-frame tables from the dense stage
    outputs — the capacities in ``p`` are EXACT by the time this runs
    (derived from the dense phase's counts)."""
    no_z = frame.ndim == 2
    mask = labels > 0
    marker, distance, branch_labels = (
        dense["marker"], dense["distance"], dense["branch_labels"])

    # stage 5 inputs: fixed-capacity marker set + MXU moment features
    mscore = distance * marker.astype(jnp.float32)
    mcoords, mvalid = _topk_coords(mscore.reshape(-1), frame.shape, p.marker_cap)
    f_log, dil = _prep_frame_kernel(vessel, distance)
    radii = dil[tuple(mcoords.T)]
    pad_i = jnp.pad(frame.astype(jnp.float32), p.roi_r)
    pad_f = jnp.pad(f_log, p.roi_r)
    stats, hu = _roi_features_kernel(
        pad_i, pad_f, mcoords, radii, mvalid, p.roi_r, no_z)

    # stage 6/7 inputs: fixed-capacity foreground voxel set with gathered
    # per-voxel attributes (labels, branch ids, intensity, structure)
    vcoords, vvalid = _topk_coords(mask.astype(jnp.float32).reshape(-1),
                                   frame.shape, p.voxel_cap)
    vat = tuple(vcoords.T)
    vlabels = jnp.where(vvalid, labels[vat], 0).astype(jnp.int32)
    vbranch = jnp.where(vvalid, branch_labels[vat].astype(jnp.int32), 0)
    vintensity = jnp.where(vvalid, frame.astype(jnp.float32)[vat], jnp.nan)
    vstructure = jnp.where(vvalid, vessel[vat], jnp.nan)

    spacing = jnp.asarray(p.sampling, jnp.float32)
    return {
        "marker_coords": mcoords,
        "marker_coords_phys": mcoords.astype(jnp.float32) * spacing[None],
        "marker_valid": mvalid,
        "marker_stats": stats,
        "marker_hu": hu,
        "voxel_coords": vcoords,
        "voxel_coords_phys": vcoords.astype(jnp.float32) * spacing[None],
        "voxel_valid": vvalid,
        "voxel_labels": vlabels,
        "voxel_branch": vbranch,
        "voxel_intensity": vintensity,
        "voxel_structure": vstructure,
    }


def _post_segment_frame(frame, vessel, labels, n_labels, p: PipelineStepParams):
    """Stages 3-4 dense + fixed-capacity stage-5/7 per-frame features,
    given the segment step's outputs. Pure function — vmap/shard freely."""
    dense = _network_markers_frame(frame, vessel, labels, p)
    out = _capacity_frame(frame, vessel, labels, n_labels, dense, p)
    out.update(dense)
    out["vessel"] = vessel
    out["labels"] = labels
    out["n_labels"] = n_labels
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
    (dense z-scored cost, reference ``hu_tracking.py:841-944``).
    Returns (vec_phys, ok, cost, origin_phys): flow rows anchored at the
    PRE-frame marker positions, like the reference's flow_vector_array."""
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
    origin = coords_pre[rmi]
    return (jnp.where(ok[:, None], vec, jnp.nan), ok,
            jnp.where(ok, rmv, 0.0), origin)


def _build_segment_dense_phase(p: PipelineStepParams, mesh: Mesh, shard_z: bool):
    """Phase 1+2: the wide-stencil segment phase (Frangi cascade +
    Hessian + thresholds + CC) runs (t, z)-sharded — few, wide halo
    exchanges amortise well over ICI — then the batch reshards to
    frame-parallel P('t') for the iterative fixpoint stages (thinning,
    JFA, marker NMS): their hundreds of sequential sub-iterations would
    be halo-exchange latency-bound under spatial sharding, so
    data-parallel-by-frame is the faster layout for them.

    Returns (vessel, labels, n_labels, dense) — everything dense, no
    capacities involved, so the TRUE per-frame counts (n_fg, n_markers,
    max_branch) come back and size the capacity phase exactly
    (VERDICT r3 #5: no overflow double-runs)."""

    def phase(batch):
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
        dense = jax.vmap(
            lambda f, v, l: _network_markers_frame(f, v, l, p))(
            batch_t, vessel, labels)
        return vessel, labels, n_labels, dense

    return phase


def _build_capacity_step(p: PipelineStepParams, mesh: Mesh):
    """Phase 3: fixed-capacity tables + tracking/matching/reassignment/
    hierarchy across consecutive frames.  ``p``'s capacities are exact
    (derived from phase 1+2's counts) by the time this compiles."""

    from nellie_tpu.kernels.voting import _vote_kernel
    from nellie_tpu.stages.flow_interpolation import _interp_tile_body
    from nellie_tpu.stages.hierarchical import _motility_kernel

    spacing_v = jnp.asarray(p.sampling, jnp.float32)
    max_d = jnp.float32(p.max_distance_um)

    def _nn_exact(queries, refs):
        """Exact squared-difference NN (not the MXU dot trick): the
        three-term per-dimension sum has a fixed association order, so
        results are bit-identical under any GSPMD partitioning — the dot
        formulation's k-contraction reassociates across shards and can
        flip d<max_distance right at the boundary (seen in the sharded
        parity test)."""
        d2 = jnp.zeros((queries.shape[0], refs.shape[0]), jnp.float32)
        for dim in range(queries.shape[1]):
            diff = queries[:, dim][:, None] - refs[:, dim][None, :]
            d2 = d2 + diff * diff
        return jnp.min(d2, axis=1), jnp.argmin(d2, axis=1).astype(jnp.int32)
    interp_d = jnp.float32(p.interp_max_distance_um)
    far = 1e6

    def interp(query_phys, query_valid, origin_phys, flow_valid, vec_phys, cost):
        """Reference flow-interp weighting at query coords (physical in,
        physical vectors out; NaN rows where no flow vector in radius)."""
        return _interp_tile_body(query_phys, query_valid, origin_phys,
                                 flow_valid, vec_phys, cost, interp_d)

    def step(batch, vessel, labels, n_labels, dense):
        t_only = NamedSharding(mesh, P("t"))
        batch_t = lax.with_sharding_constraint(batch, t_only)

        per = jax.vmap(
            lambda f, v, l, n, dn: _capacity_frame(f, v, l, n, dn, p))(
            batch_t, vessel, labels, n_labels, dense)
        per = dict(per)
        for k in ("skel", "pixel_class", "branch_labels", "marker",
                  "distance", "border", "n_fg", "n_markers"):
            per[k] = dense[k]
        per["labels"] = labels
        per["n_labels"] = n_labels

        # stage 5: match markers of frame t -> t+1 (vmap over frame pairs);
        # rows anchored at the pre-frame marker (reference flow rows)
        feats = jnp.concatenate([per["marker_stats"], per["marker_hu"]], axis=2)
        flow_vec, flow_ok, flow_cost, flow_origin = jax.vmap(
            lambda cpo, cpr, fpo, fpr, vpo, vpr: _match_pair(
                cpo, cpr, fpo, fpr, vpo, vpr, max_d))(
            per["marker_coords_phys"][1:], per["marker_coords_phys"][:-1],
            feats[1:], feats[:-1],
            per["marker_valid"][1:], per["marker_valid"][:-1])
        flow_finite = flow_ok & ~jnp.isnan(flow_vec).any(axis=-1)
        flow_vec0 = jnp.nan_to_num(flow_vec)

        # the capped marker/voxel tables are tiny next to the volumes:
        # pin them (and the flow rows) to a fully-replicated layout so the
        # interp/NN/vote float reductions are computed identically on
        # every device — partitioned contractions reassociate and can
        # flip d<max_distance boundary decisions between mesh sizes
        rep = NamedSharding(mesh, P())
        flow_vec0 = lax.with_sharding_constraint(flow_vec0, rep)
        flow_cost = lax.with_sharding_constraint(flow_cost, rep)
        flow_origin = lax.with_sharding_constraint(flow_origin, rep)
        flow_finite = lax.with_sharding_constraint(flow_finite, rep)
        vc_phys = lax.with_sharding_constraint(per["voxel_coords_phys"], rep)
        vvalid = lax.with_sharding_constraint(per["voxel_valid"], rep)

        # stage 7 motility inputs: fwd (vec12) and bwd (vec01) interpolated
        # flow at every frame's voxel set, voxel units
        def fwd_at(t_pair):
            return interp(vc_phys[t_pair], vvalid[t_pair],
                          flow_origin[t_pair], flow_finite[t_pair],
                          flow_vec0[t_pair], flow_cost[t_pair])

        def bwd_at(t_pair):
            # bwd query at frame t_pair+1 voxels; flow anchored at the
            # post-frame position (origin + vec), reference fi:277-292
            return interp(vc_phys[t_pair + 1], vvalid[t_pair + 1],
                          flow_origin[t_pair] + flow_vec0[t_pair],
                          flow_finite[t_pair], flow_vec0[t_pair],
                          flow_cost[t_pair])

        n_t = vc_phys.shape[0]
        pair_idx = jnp.arange(n_t - 1)
        vec12_pairs = jax.vmap(fwd_at)(pair_idx)       # (T-1, V, d) at frames 0..T-2
        vec01_pairs = jax.vmap(bwd_at)(pair_idx)       # (T-1, V, d) at frames 1..T-1
        nanrow = jnp.full((1,) + vec12_pairs.shape[1:], jnp.nan)
        vec12 = jnp.concatenate([vec12_pairs, nanrow])             # per frame t
        vec01 = jnp.concatenate([nanrow, vec01_pairs])
        vec12_px = vec12 / spacing_v[None, None, :]
        vec01_px = vec01 / spacing_v[None, None, :]

        # stage 7: the full 11-statistic voxel bundle + per-level stats
        mot = jax.vmap(lambda c, v01, v12, lbl: _motility_kernel(
            c.astype(jnp.float32), v01, v12, lbl, spacing_v, jnp.float32(1.0),
            no_z=batch.ndim - 1 == 2, has01=True, num_labels=p.branch_cap))(
            per["voxel_coords"],
            vec01_px, vec12_px,
            jnp.where(vvalid, per["voxel_branch"], -1))
        vox_stats = jnp.concatenate(
            [mot, per["voxel_structure"][:, None, :],
             per["voxel_intensity"][:, None, :]], axis=1)  # (T, 11, V)

        seg_org = jnp.where(vvalid, per["voxel_labels"], -1)
        seg_br = jnp.where(vvalid, per["voxel_branch"], -1)
        hier_org = jax.vmap(lambda v, s: _segment_nanstats_kernel(
            v, s, p.label_cap))(vox_stats, seg_org)      # (T, 5, 11, L)
        hier_branch = jax.vmap(lambda v, s: _segment_nanstats_kernel(
            v, s, p.branch_cap))(vox_stats, seg_br)      # (T, 5, 11, B)

        # stage 6: flow-guided fwd+bwd voxel matching with weighted label
        # VOTING (reference voxel_reassignment.py:907-992; single voting
        # pass — the reference's refine iterations re-vote only residual
        # unassigned targets), chained t=0 -> T-1 so identities propagate
        vcap = p.voxel_cap

        def reassign_pair(prev_labels, t_pair):
            vc_t = jnp.where(vvalid[t_pair][:, None], vc_phys[t_pair], far)
            vc_t1 = jnp.where(vvalid[t_pair + 1][:, None], vc_phys[t_pair + 1], far)
            # forward: predict t voxels into t+1, NN against t+1 voxels
            fvec = vec12[t_pair]
            f_ok = vvalid[t_pair] & ~jnp.isnan(fvec).any(axis=1) & (prev_labels > 0)
            pred = jnp.where(f_ok[:, None], vc_t + jnp.nan_to_num(fvec), far * 2)
            d2_f, i_f = _nn_exact(pred, vc_t1)
            d_f = jnp.sqrt(jnp.maximum(d2_f, 0.0))
            keep_f = f_ok & (d_f < p.max_distance_um)
            # backward: predict t+1 voxels into t, NN against t voxels
            bvec = vec01[t_pair + 1]
            b_ok = vvalid[t_pair + 1] & ~jnp.isnan(bvec).any(axis=1)
            pred_b = jnp.where(b_ok[:, None], vc_t1 - jnp.nan_to_num(bvec), far * 2)
            d2_b, i_b = _nn_exact(pred_b, vc_t)
            d_b = jnp.sqrt(jnp.maximum(d2_b, 0.0))
            src_lbl_b = prev_labels[i_b]
            keep_b = b_ok & (d_b < p.max_distance_um) & (src_lbl_b > 0)

            targets = jnp.concatenate([i_f, jnp.arange(vcap, dtype=i_f.dtype)])
            lbls = jnp.concatenate([prev_labels, src_lbl_b]).astype(jnp.int32)
            dists = jnp.concatenate([d_f, d_b])
            valid = jnp.concatenate([keep_f, keep_b])
            weights = (1.0 / (dists + 1e-6)).astype(jnp.float32)
            win, tgt, lbl, _ = _vote_kernel(
                targets.astype(jnp.int32), lbls, weights, valid)
            new = jnp.zeros((vcap,), jnp.int32).at[
                jnp.where(win, tgt, vcap)].set(
                jnp.where(win, lbl, 0), mode="drop")
            return new, new

        init = jnp.where(vvalid[0], per["voxel_labels"][0], 0)
        _, reassigned_tail = lax.scan(reassign_pair, init, pair_idx)
        reassigned_vox = jnp.concatenate([init[None], reassigned_tail])  # (T, V)

        # dense reassigned label volumes (t=0 copied, like the reference)
        def scatter_frame(lbls_v, coords, valid):
            flat = jnp.ravel_multi_index(
                tuple(coords.T), batch.shape[1:], mode="clip")
            flat = jnp.where(valid, flat, batch[0].size)
            vol = jnp.zeros((batch[0].size + 1,), jnp.int32).at[flat].set(
                jnp.where(valid, lbls_v, 0), mode="drop")
            return vol[:-1].reshape(batch.shape[1:])

        reassigned_obj = jax.vmap(scatter_frame)(
            reassigned_vox, per["voxel_coords"], vvalid)

        return {
            "labels": per["labels"],
            "n_labels": per["n_labels"],
            "n_fg": per["n_fg"],
            "n_markers": per["n_markers"],
            "skel": per["skel"],
            "branch_labels": per["branch_labels"],
            "marker": per["marker"],
            "flow_vec": flow_vec,
            "flow_ok": flow_ok,
            "flow_cost": flow_cost,
            "reassigned_vox": reassigned_vox,
            "reassigned_obj": reassigned_obj,
            "vox_stats": vox_stats,
            "hier_organelle": hier_org,
            "hier_branch": hier_branch,
        }

    return step


def _bucket_pow2(n: int, minimum: int) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def full_pipeline_step(batch, p: PipelineStepParams, mesh: Mesh,
                       adaptive_caps: bool = True):
    """Run the complete dense pipeline over a (T, *spatial) batch sharded
    (t = data parallel; z = spatial parallel for the segment phase).
    Returns a host-side dict of numpy arrays.

    Capacity sizing (VERDICT r3 #5): the segment + dense network/markers
    phases run FIRST (no capacities involved) and return the true
    per-frame counts — fg voxels, markers, label/branch id maxima — as a
    few scalars per frame; the capacity phase then compiles with
    exactly-sized (power-of-two bucketed, ``p``'s caps as minimums)
    tables and consumes the phase-1 arrays straight from HBM.  Overflow
    re-runs are structurally impossible; ``adaptive_caps=False`` pins
    ``p``'s caps verbatim (top-k truncation, for tests)."""
    from nellie_tpu.utils.base_logger import logger

    batch = jnp.asarray(batch, jnp.float32)
    shard_z = (mesh.shape.get("z", 1) > 1
               and batch.ndim >= 2
               and batch.shape[1] % mesh.shape["z"] == 0)
    spec = [None] * batch.ndim
    spec[0] = "t"
    if shard_z:
        spec[1] = "z"
    in_sharding = NamedSharding(mesh, P(*spec))
    batch_dev = jax.device_put(batch, in_sharding)

    phase1 = jax.jit(_build_segment_dense_phase(p, mesh, shard_z),
                     in_shardings=in_sharding)
    vessel, labels, n_labels, dense = phase1(batch_dev)

    # true counts: a handful of scalars per frame cross the link
    n_fg = int(np.asarray(dense["n_fg"]).max())
    n_mk = int(np.asarray(dense["n_markers"]).max())
    n_lb = int(np.asarray(n_labels).max())
    n_br = int(np.asarray(dense["max_branch"]).max())
    if adaptive_caps:
        from dataclasses import replace

        # label/branch ids are 1-based: id == cap falls into the stats
        # kernels' overflow bucket, so the caps must exceed the max id
        p_run = replace(p,
                        voxel_cap=_bucket_pow2(max(n_fg, 1), p.voxel_cap),
                        marker_cap=_bucket_pow2(max(n_mk, 1), p.marker_cap),
                        label_cap=_bucket_pow2(n_lb + 1, p.label_cap),
                        branch_cap=_bucket_pow2(n_br + 1, p.branch_cap))
    else:
        p_run = p
        over = []
        if n_fg > p.voxel_cap:
            over.append(f"voxel_cap {p.voxel_cap} < {n_fg} fg voxels")
        if n_mk > p.marker_cap:
            over.append(f"marker_cap {p.marker_cap} < {n_mk} markers")
        if n_lb >= p.label_cap:
            over.append(f"label_cap {p.label_cap} <= {n_lb} labels")
        if n_br >= p.branch_cap:
            over.append(f"branch_cap {p.branch_cap} <= {n_br} branches")
        if over:
            logger.warning("pipeline_step capacity overflow (%s) — results "
                           "are top-k truncated", "; ".join(over))

    phase3 = jax.jit(_build_capacity_step(p_run, mesh))
    out = phase3(batch_dev, vessel, labels, n_labels, dense)
    result = {k: np.asarray(v) for k, v in out.items()}
    return result


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
