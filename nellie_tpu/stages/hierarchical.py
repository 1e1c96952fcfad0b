"""Stage 7 — Hierarchy: voxel → node → branch → organelle → image features.

Produces the reference Hierarchy's artifacts — five streaming CSV tables
(``features_voxels/nodes/branches/organelles/image``) and the pickled
adjacency edge lists (``adjacency_maps.pkl``) — from a frame-major,
device-centric design instead of the reference's level-major host
accumulation (``/root/reference/nellie/feature_extraction/
hierarchical.py:235-273``):

* each timepoint is loaded once and flows through one extraction pass
  producing fixed-schema per-level tables; CSV rows stream out per frame,
  so host memory stays O(frame) instead of O(dataset)
* every per-group statistic (voxel→node/branch/organelle/image) is an XLA
  segment reduction on device (``kernels/segstats.py``), replacing the
  reference's padded-index-matrix host gathers (hierarchical.py:1165-1272)
* thickness = distance to the nearest border voxel: the reference's host
  cKDTree (hierarchical.py:1432-1441) becomes the Pallas MXU brute-force
  NN kernel (``kernels/pallas_nn.py``) over physical coordinates — exact,
  and shared by nodes (thickness) and branches (tip radii, median width)
* branch centerline length/degree — the reference's per-offset host sweep
  (hierarchical.py:1515-1618) — is a jitted 13-offset stencil whose label
  totals are one segment_sum (``kernels/segstats.branch_geometry``)
* voxel motility (feature definitions per hierarchical.py:861-1061) is one
  jitted kernel: flow-derived linear/angular velocity and acceleration
  plus the branch-relative variants, with the per-branch reference voxel
  (minimum |flow|) found by an on-device segment-argmin

Feature names, CSV column order, and adjacency key layout are identical
to the reference so the napari Analysis tab and downstream notebooks work
unchanged.
"""
from __future__ import annotations

import os
import pickle
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp
from functools import partial

from nellie_tpu.io.verifier import ImInfo
from nellie_tpu.kernels.pallas_nn import nearest_neighbors
from nellie_tpu.kernels.segstats import (
    STAT_KEYS,
    _bucket,
    branch_geometry,
    segment_nanstats,
    segment_nanstats_gathered,
)
from nellie_tpu.stages.flow_interpolation import FlowInterpolator
from nellie_tpu.utils import adaptive_run, transfer
from nellie_tpu.utils.base_logger import logger
from nellie_tpu.utils.regionprops import regionprops

# statistic names per level, in CSV column order (reference parity)
VOXEL_STATS = (
    "linear_vel", "angular_vel", "linear_acc", "angular_acc",
    "rel_linear_vel", "rel_angular_vel", "rel_linear_acc",
    "rel_angular_acc", "rel_directionality", "structure", "intensity",
)
NODE_STATS = ("divergence", "convergence", "vergere", "node_thickness")
BRANCH_STATS = (
    "branch_length", "branch_thickness", "branch_aspect_ratio",
    "branch_tortuosity", "branch_area", "branch_axis_length_maj",
    "branch_axis_length_min", "branch_extent", "branch_solidity",
)
ORGANELLE_STATS = (
    "organelle_area", "organelle_axis_length_maj",
    "organelle_axis_length_min", "organelle_extent", "organelle_solidity",
)


def border_distance(border_mask: np.ndarray, coords: np.ndarray, spacing) -> np.ndarray:
    """Physical distance from each coordinate to the nearest border voxel
    — exact brute force on the MXU (replaces the reference's cKDTree,
    hierarchical.py:1432-1441)."""
    coords = np.asarray(coords, np.float64)
    if coords.size == 0:
        return np.zeros((0,), np.float32)
    border_coords = np.argwhere(border_mask)
    if border_coords.size == 0:
        return np.full(len(coords), np.nan, dtype=np.float32)
    spacing = np.asarray(spacing, np.float64)
    dist, _ = nearest_neighbors(coords * spacing, border_coords * spacing)
    return dist


# ---------------------------------------------------------------------------
# motility kernel
# ---------------------------------------------------------------------------

def _segment_argmin(values, seg_ids, num_segments):
    """Index of the minimum value per segment (-1 where empty); ties break
    to the smallest index, matching a stable sort-by-(segment, value)."""
    n = values.shape[0]
    valid = (~jnp.isnan(values)) & (seg_ids >= 0) & (seg_ids < num_segments)
    sid = jnp.where(valid, seg_ids, num_segments).astype(jnp.int32)
    m = jax.ops.segment_min(jnp.where(valid, values, jnp.inf), sid, num_segments + 1)
    ismin = valid & (values == m[sid])
    big = jnp.int32(np.iinfo(np.int32).max)
    idx = jax.ops.segment_min(
        jnp.where(ismin, jnp.arange(n, dtype=jnp.int32), big), sid, num_segments + 1)
    return jnp.where(idx == big, -1, idx)[:num_segments]


@partial(jax.jit, static_argnames=("no_z", "has01", "num_labels"))
def _motility_kernel(coords_px, vec01_px, vec12_px, labels, spacing, dt,
                     no_z: bool, has01: bool, num_labels: int):
    """All per-voxel motility statistics for one frame.

    coords_px/vec01_px/vec12_px: (N, d) voxel-space; labels: (N,) branch
    ids (padding rows -1); spacing (d,); dt scalar. vec12 must exist
    (t < T-1) — the t==T-1 frame is all-NaN by definition and never calls
    this. Returns a dict of (N,) magnitude columns.
    """
    nan = jnp.float32(jnp.nan)
    n, d = coords_px.shape
    sp = spacing[None, :]
    coords_1 = coords_px * sp

    def lin(ra, rb):
        v = (rb - ra) / dt
        return v, jnp.linalg.norm(v, axis=1)

    def ang(ra, rb):
        if no_z:
            theta_a = jnp.arctan2(ra[:, 1], ra[:, 0])
            theta_b = jnp.arctan2(rb[:, 1], rb[:, 0])
            delta = (theta_b - theta_a + jnp.pi) % (2 * jnp.pi) - jnp.pi
            av = delta / dt
            return av, jnp.abs(av)
        cross = jnp.cross(ra, rb)
        norm = jnp.linalg.norm(ra, axis=1) * jnp.linalg.norm(rb, axis=1)
        ang_disp = jnp.where(norm[:, None] != 0, cross / jnp.where(norm[:, None] != 0, norm[:, None], 1.0), nan)
        av = ang_disp / dt
        return av, jnp.linalg.norm(av, axis=1)

    def rel_coords(vec_phys, a_px, b_px):
        """Positions relative to the branch's reference voxel — the member
        of minimum |flow| (hierarchical.py:861-913).

        The subtraction happens in PIXEL space before scaling: computing
        ``a_px*sp - gather(a_px*sp)`` lets XLA fuse the first product into
        an FMA whose unrounded result leaves a ~1e-8 residual at the
        reference voxel itself — which then defeats the ``norm != 0`` NaN
        gate of the angular formulas and emits noise-direction values
        (caught by the features-CSV oracle).  ``(a_px - a_px[ref]) * sp``
        is exactly zero at the reference voxel under any fusion."""
        euc = jnp.linalg.norm(vec_phys, axis=1)
        ref_of_label = _segment_argmin(euc, labels, num_labels)
        lbl_ok = (labels >= 0) & (labels < num_labels)
        ridx = jnp.where(lbl_ok, ref_of_label[jnp.clip(labels, 0, num_labels - 1)], -1)
        ok = (ridx >= 0)[:, None]
        ridx_c = jnp.maximum(ridx, 0)
        ra = jnp.where(ok, (a_px - a_px[ridx_c]) * sp, nan)
        rb = jnp.where(ok, (b_px - b_px[ridx_c]) * sp, nan)
        ra = jnp.where(jnp.isnan(vec_phys), nan, ra)
        rb = jnp.where(jnp.isnan(vec_phys), nan, rb)
        return ra, rb

    vec12 = vec12_px * sp
    coords_2 = (coords_px + vec12_px) * sp

    lin_vel_v, lin_vel_mag = lin(coords_1, coords_2)
    ang_vel, ang_vel_mag = ang(coords_1, coords_2)
    r1_rel, r2_rel = rel_coords(vec12, coords_px, coords_px + vec12_px)
    lin_vel_rel_v, lin_vel_rel_mag = lin(r1_rel, r2_rel)
    ang_vel_rel, ang_vel_rel_mag = ang(r1_rel, r2_rel)
    r1m = jnp.linalg.norm(r1_rel, axis=1)
    r2m = jnp.linalg.norm(r2_rel, axis=1)
    denom = r2m + r1m
    directionality = jnp.where(
        denom != 0, jnp.abs(r2m - r1m) / jnp.where(denom != 0, denom, 1.0), nan)

    if has01:
        vec01 = vec01_px * sp
        coords_0 = (coords_px - vec01_px) * sp
        lin_vel_01v, _ = lin(coords_0, coords_1)
        ang_vel_01, _ = ang(coords_0, coords_1)
        r0_rel, r1_rel01 = rel_coords(vec01, coords_px - vec01_px, coords_px)
        lin_vel_rel_01v, _ = lin(r0_rel, r1_rel01)
        ang_vel_rel_01, _ = ang(r0_rel, r1_rel01)

        lin_acc = (lin_vel_v - lin_vel_01v) / dt
        lin_acc_mag = jnp.linalg.norm(lin_acc, axis=1)
        ang_acc = (ang_vel - ang_vel_01) / dt
        lin_acc_rel = (lin_vel_rel_v - lin_vel_rel_01v) / dt
        lin_acc_rel_mag = jnp.linalg.norm(lin_acc_rel, axis=1)
        ang_acc_rel = (ang_vel_rel - ang_vel_rel_01) / dt
        if no_z:
            ang_acc_mag = jnp.abs(ang_acc)
            ang_acc_rel_mag = jnp.abs(ang_acc_rel)
        else:
            ang_acc_mag = jnp.linalg.norm(ang_acc, axis=1)
            ang_acc_rel_mag = jnp.linalg.norm(ang_acc_rel, axis=1)
    else:
        nana = jnp.full((n,), nan)
        lin_acc_mag = nana
        ang_acc_mag = nana
        lin_acc_rel_mag = nana
        ang_acc_rel_mag = nana

    # one stacked (9, N) output -> a single device->host transfer
    return jnp.stack([
        lin_vel_mag, ang_vel_mag, lin_acc_mag, ang_acc_mag,
        lin_vel_rel_mag, ang_vel_rel_mag, lin_acc_rel_mag, ang_acc_rel_mag,
        directionality,
    ])


_MOTILITY_KEYS = (
    "linear_vel", "angular_vel", "linear_acc", "angular_acc",
    "rel_linear_vel", "rel_angular_vel", "rel_linear_acc",
    "rel_angular_acc", "rel_directionality",
)


@partial(jax.jit, static_argnames=("no_z", "has01", "num_labels"))
def _frame_stats_kernel(coords_px, vec01_px, vec12_px, labels, structure,
                        intensity, spacing, dt, no_z: bool, has01: bool,
                        num_labels: int):
    """Motility bundle + structure/intensity rows as ONE (11, N) device
    matrix — the frame's full voxel-statistics table in VOXEL_STATS
    order.  Kept device-resident so the branch/organelle segment
    reductions consume it without a re-upload; pulled exactly once for
    the features_voxels CSV."""
    mot = _motility_kernel(coords_px, vec01_px, vec12_px, labels, spacing,
                           dt, no_z=no_z, has01=has01, num_labels=num_labels)
    return jnp.concatenate([mot, structure[None], intensity[None]], axis=0)


@partial(jax.jit, static_argnames=())
def _box_membership_kernel(lims_lo, lims_hi, coords):
    """(M, C) mask: coords[c] inside node r's radius box (inclusive
    bounds, reference hierarchical.py:779-801)."""
    m = jnp.ones((lims_lo.shape[0], coords.shape[0]), bool)
    for dim in range(coords.shape[1]):
        c = coords[None, :, dim]
        m = m & (lims_lo[:, dim, None] <= c) & (c <= lims_hi[:, dim, None])
    return m


@jax.jit
def _node_agg_scan_kernel(lims_lo, lims_hi, node_coords, coords_chunks,
                          vec01_chunks, vec12_chunks, stats_chunks):
    """All node-level aggregations for one frame in ONE device program.

    Replaces the round-2 pipeline of [pair extraction on device ->
    (node, voxel) pairs to host -> direction/dot math in numpy -> pair
    tables back to device for segment stats]: a ``jnp.nonzero`` over the
    ~50M-element membership mask alone measured ~550 ms/chunk on TPU,
    and the pair lists crossed the link twice.  Here the membership mask
    is consumed where it is produced — every statistic reduces over the
    chunk axis in-register and only (stat, node)-sized results leave the
    device.

    Shapes: ``lims_lo/hi`` (M, d) int32 boxes (empty box = lo > hi);
    ``node_coords`` (M, d) f32; ``coords_chunks`` (K, chunk, d) int32
    voxel coords (pad -1: outside every box); ``vec01/vec12_chunks``
    (K, chunk, d) f32 flow vectors (pad NaN); ``stats_chunks``
    (K, S, chunk) f32 voxel statistics (pad NaN).

    Semantics per reference ``hierarchical.py:1323-1393``: direction =
    (voxel - node) / |voxel - node| (NaN at zero distance), convergence
    = nanmean of vec01·direction, divergence = nanmean of vec12·
    direction; plus nan-aware mean/std/min/max/sum of every voxel
    statistic over each node's member voxels (population std, two-pass
    centered like ``kernels.segstats``).

    Returns (c01, s01, c12, s12, cm, scoords, cnt_s, sum_s, mn_s, mx_s,
    ssq_s) — counts/sums per node (and per (S, node) for the stats).
    """
    nan = jnp.float32(jnp.nan)
    M, d = lims_lo.shape
    S = stats_chunks.shape[1]

    def chunk_terms(cc, v01, v12):
        mask = _box_membership_kernel(lims_lo, lims_hi, cc)
        mag2 = jnp.zeros(mask.shape, jnp.float32)
        rdot01 = jnp.zeros(mask.shape, jnp.float32)
        rdot12 = jnp.zeros(mask.shape, jnp.float32)
        for dim in range(d):
            dv = cc[:, dim].astype(jnp.float32)[None, :] - node_coords[:, dim][:, None]
            mag2 = mag2 + dv * dv
            rdot01 = rdot01 + dv * v01[:, dim][None, :]
            rdot12 = rdot12 + dv * v12[:, dim][None, :]
        mag = jnp.sqrt(mag2)
        ok = mag > 0
        dot01 = jnp.where(ok, rdot01 / jnp.where(ok, mag, 1.0), nan)
        dot12 = jnp.where(ok, rdot12 / jnp.where(ok, mag, 1.0), nan)
        return mask, dot01, dot12

    def nansum_count(mask, vals):
        valid = mask & ~jnp.isnan(vals)
        return (jnp.sum(valid, axis=-1).astype(jnp.float32),
                jnp.sum(jnp.where(valid, vals, 0.0), axis=-1))

    def pass1(carry, xs):
        cc, v01, v12, st = xs
        mask, dot01, dot12 = chunk_terms(cc, v01, v12)
        c01, s01 = nansum_count(mask, dot01)
        c12, s12 = nansum_count(mask, dot12)
        cm = jnp.sum(mask, axis=1).astype(jnp.float32)
        scoords = jnp.stack([
            jnp.sum(jnp.where(mask, cc[:, dim].astype(jnp.float32)[None, :], 0.0), axis=1)
            for dim in range(d)])
        # count/sum per (node, stat) as MXU matmuls: (M, chunk)@(chunk, S)
        maskf = mask.astype(jnp.float32)
        validf = (~jnp.isnan(st)).astype(jnp.float32)  # (S, chunk)
        st0 = jnp.nan_to_num(st, nan=0.0)
        cnt_s = (maskf @ validf.T).T  # (S, M)
        sum_s = (maskf @ (validf * st0).T).T
        # min/max per stat: 2D (M, chunk) selects, unrolled over S
        mn_rows, mx_rows = [], []
        for s_i in range(S):
            valid = mask & validf[s_i].astype(bool)[None, :]
            row = st[s_i][None, :]
            mn_rows.append(jnp.min(jnp.where(valid, row, jnp.inf), axis=1))
            mx_rows.append(jnp.max(jnp.where(valid, row, -jnp.inf), axis=1))
        mn_s = jnp.stack(mn_rows)
        mx_s = jnp.stack(mx_rows)
        (ac01, as01, ac12, as12, acm, asc, acnt, asum, amn, amx) = carry
        return ((ac01 + c01, as01 + s01, ac12 + c12, as12 + s12, acm + cm,
                 asc + scoords, acnt + cnt_s, asum + sum_s,
                 jnp.minimum(amn, mn_s), jnp.maximum(amx, mx_s)), None)

    zero_m = jnp.zeros((M,), jnp.float32)
    zero_sm = jnp.zeros((S, M), jnp.float32)
    init = (zero_m, zero_m, zero_m, zero_m, zero_m,
            jnp.zeros((d, M), jnp.float32), zero_sm, zero_sm,
            jnp.full((S, M), jnp.inf), jnp.full((S, M), -jnp.inf))
    carry, _ = jax.lax.scan(
        pass1, init, (coords_chunks, vec01_chunks, vec12_chunks, stats_chunks))
    c01, s01, c12, s12, cm, scoords, cnt_s, sum_s, mn_s, mx_s = carry

    mean_s = sum_s / jnp.maximum(cnt_s, 1.0)  # (S, M)

    def pass2(acc, xs):
        cc, st = xs
        mask = _box_membership_kernel(lims_lo, lims_hi, cc)
        rows = []
        for s_i in range(S):
            valid = mask & ~jnp.isnan(st[s_i])[None, :]
            diff = st[s_i][None, :] - mean_s[s_i][:, None]  # (M, chunk)
            rows.append(jnp.sum(jnp.where(valid, diff * diff, 0.0), axis=1))
        return acc + jnp.stack(rows), None

    ssq_s, _ = jax.lax.scan(pass2, zero_sm, (coords_chunks, stats_chunks))
    # two stacked outputs -> two device->host pulls for the whole frame
    node_sums = jnp.concatenate(
        [c01[None], s01[None], c12[None], s12[None], cm[None], scoords], axis=0)
    stat_sums = jnp.stack([cnt_s, sum_s, mn_s, mx_s, ssq_s])
    return node_sums, stat_sums


def _host_box_pairs(lo, hi, coords, shape):
    """(pair_node, pair_vox) where ``lo[n] <= coords[v] <= hi[n]`` per
    dim — pure-numpy range queries, zero device traffic.  ``coords``
    from :func:`np.argwhere` is lexicographically sorted, so the raveled
    key is ascending and every node box decomposes into contiguous key
    segments per leading-dims row, found with two vectorized
    ``searchsorted`` calls.  Replaces the round-2 bit-packed device mask
    (a ~20 MB pull + unpackbits per bench frame)."""
    lo = np.asarray(lo, np.int64)
    hi = np.asarray(hi, np.int64)
    coords = np.asarray(coords, np.int64)
    m, d = lo.shape
    empty = np.zeros(0, np.int32), np.zeros(0, np.int32)
    if m == 0 or len(coords) == 0:
        return empty
    dims = np.asarray(shape, np.int64)
    gkey = np.ravel_multi_index(tuple(coords.T), tuple(dims))
    if np.any(np.diff(gkey) < 0):  # defensive: argwhere order is sorted
        order = np.argsort(gkey, kind="stable")
        gkey = gkey[order]
    else:
        order = None
    hi_c = np.minimum(hi, dims[None, :] - 1)
    # expand each node over its leading-dims grid (all dims except last)
    ext = np.clip(hi_c[:, :-1] - lo[:, :-1] + 1, 0, None)  # (m, d-1)
    rows_per_node = np.prod(ext, axis=1)
    total = int(rows_per_node.sum())
    if total == 0:
        return empty
    node_rep = np.repeat(np.arange(m), rows_per_node)
    offs = np.zeros(m + 1, np.int64)
    np.cumsum(rows_per_node, out=offs[1:])
    r = np.arange(total) - offs[node_rep]  # row index within node grid
    base = np.zeros(total, np.int64)  # raveled key of (leading dims, x=0)
    for dim in range(d - 2, -1, -1):
        e = ext[node_rep, dim]
        base += (lo[node_rep, dim] + r % e) * np.prod(dims[dim + 1:])
        r //= e
    a = np.searchsorted(gkey, base + lo[node_rep, -1], "left")
    b = np.searchsorted(gkey, base + hi_c[node_rep, -1], "right")
    cnt = np.maximum(b - a, 0)
    tp = int(cnt.sum())
    if tp == 0:
        return empty
    row_rep = np.repeat(np.arange(total), cnt)
    starts = np.zeros(total + 1, np.int64)
    np.cumsum(cnt, out=starts[1:])
    pair_vox = (np.arange(tp) - starts[row_rep] + a[row_rep])
    if order is not None:
        pair_vox = order[pair_vox]
    return node_rep[row_rep].astype(np.int32), pair_vox.astype(np.int32)


# ---------------------------------------------------------------------------
# per-frame level tables
# ---------------------------------------------------------------------------

def _agg_columns(stat_names, agg) -> dict:
    """Flatten a segment-stats result into `{stat}_{key}` CSV columns."""
    cols = {}
    for i, name in enumerate(stat_names):
        for key in STAT_KEYS:
            cols[f"{name}_{key}"] = np.asarray(agg[key][i], float)
    return cols


def _ids_into(member_labels: np.ndarray, row_labels: np.ndarray) -> np.ndarray:
    """Map labels to row indices of `row_labels` (sorted unique); -1 where
    absent (those members don't contribute)."""
    member_labels = np.asarray(member_labels, np.int64)
    if len(row_labels) == 0:
        return np.full(member_labels.shape, -1, np.int32)
    pos = np.searchsorted(row_labels, member_labels)
    pos_c = np.clip(pos, 0, len(row_labels) - 1)
    ok = row_labels[pos_c] == member_labels
    return np.where(ok, pos_c, -1).astype(np.int32)


def _majority_by_label(labels: np.ndarray, values: np.ndarray,
                       row_labels: np.ndarray) -> np.ndarray:
    """Most frequent value per label (ties → smallest value), NaN where a
    row label has no members — np.argmax(np.bincount(...)) semantics
    without the per-region loop (hierarchical.py:1787-1793)."""
    out = np.full(len(row_labels), np.nan)
    labels = np.asarray(labels, np.int64)
    if labels.size == 0 or len(row_labels) == 0:
        return out
    values = np.asarray(values, np.int64)
    order = np.lexsort((values, labels))
    l, v = labels[order], values[order]
    change = np.ones(len(l), bool)
    change[1:] = (l[1:] != l[:-1]) | (v[1:] != v[:-1])
    starts = np.nonzero(change)[0]
    counts = np.diff(np.append(starts, len(l)))
    gl, gv = l[starts], v[starts]
    pick = np.lexsort((gv, -counts, gl))
    first = np.ones(len(pick), bool)
    first[1:] = gl[pick][1:] != gl[pick][:-1]
    sel = pick[first]
    idx = _ids_into(gl[sel], np.asarray(row_labels, np.int64))
    ok = idx >= 0
    out[idx[ok]] = gv[sel][ok]
    return out


class _VoxelLevel:
    """Per-voxel features for one frame: coordinates, intensity/structure
    gathers, and the motility bundle. `stats` is the (11, N) value matrix
    in VOXEL_STATS order that all higher levels aggregate from."""

    def __init__(self, h: "Hierarchy", t: int):
        self.t = t
        label_frame = np.asarray(h.label_components[t])
        self.coords = np.argwhere(label_frame > 0)
        n = len(self.coords)
        at = tuple(self.coords.T)
        self.component_labels = label_frame[at].astype(np.int64)
        self.branch_labels = np.asarray(h.label_branches[t])[at].astype(np.int64)
        self.intensity = np.asarray(h.im_raw[t])[at].astype(np.float32)
        self.structure = np.asarray(h.im_struct[t])[at].astype(np.float32)

        d = self.coords.shape[1]
        if h.im_info.no_z:
            self.z = np.full(n, np.nan, np.float32)
            self.y = self.coords[:, 0].astype(np.float32)
            self.x = self.coords[:, 1].astype(np.float32)
        else:
            self.z = self.coords[:, 0].astype(np.float32)
            self.y = self.coords[:, 1].astype(np.float32)
            self.x = self.coords[:, 2].astype(np.float32)

        spacing = np.asarray(h.spacing, np.float32)
        self._spacing = spacing
        self._n = n
        self._vec01_px_dev = None
        self._vec12_px_dev = None
        self._vec01_np = None
        self._vec12_np = None
        motility = {k: np.full(n, np.nan, np.float32)
                    for k in VOXEL_STATS if k not in ("structure", "intensity")}
        self.stats_dev = None  # (11, npad) device matrix, NaN-padded

        run_motility = (h.enable_motility and h.flow_interpolator_fw is not None
                        and h.num_t is not None and h.num_t > 1 and n > 0)
        out01 = out12 = None
        if run_motility:
            coords_f = self.coords.astype(np.float32)
            # the interpolators cache per-t row selections on themselves —
            # serialize against concurrently built frames.  Device variant:
            # the vectors feed straight into the motility kernel below
            # and are only pulled to host if the node level needs them.
            with h._interp_lock:
                if t > 0:
                    out01 = h.flow_interpolator_bw.interpolate_coord_dev(coords_f, t)
                if t < h.num_t - 1:
                    out12 = h.flow_interpolator_fw.interpolate_coord_dev(coords_f, t)
        if out12 is not None:
            vec12_dev, _ = out12
            npad = vec12_dev.shape[0]
            lb = _bucket(int(self.branch_labels.max()) + 1 if n else 1, 8)
            cp = np.zeros((npad, d), np.float32)
            cp[:n] = self.coords
            lbl = np.full((npad,), -1, np.int32)
            lbl[:n] = self.branch_labels
            vec01_dev = (out01[0] if out01 is not None
                         else jnp.full((npad, d), jnp.nan, jnp.float32))
            struct_pad = np.full((npad,), np.nan, np.float32)
            struct_pad[:n] = self.structure
            inten_pad = np.full((npad,), np.nan, np.float32)
            inten_pad[:n] = self.intensity
            self._vec01_px_dev = vec01_dev
            self._vec12_px_dev = vec12_dev
            self.stats_dev = _frame_stats_kernel(
                jnp.asarray(cp), vec01_dev, vec12_dev, jnp.asarray(lbl),
                jnp.asarray(struct_pad), jnp.asarray(inten_pad),
                jnp.asarray(spacing),
                jnp.float32(h.im_info.dim_res["T"] or 1.0),
                no_z=h.im_info.no_z, has01=t > 0, num_labels=lb)
            # ONE pull for the whole voxel table (CSV + host consumers),
            # trimmed on device to a granule above n — the pow2 bucket
            # would otherwise ship up to 2x the real bytes
            self.stats = np.asarray(
                transfer.trim_last(self.stats_dev, n))[:, :n]
            for i, k in enumerate(_MOTILITY_KEYS):
                motility[k] = self.stats[i]
        else:
            if out01 is not None:  # t == T-1: backward vectors still exist
                self._vec01_px_dev = out01[0]
            self.stats = np.stack([
                motility["linear_vel"], motility["angular_vel"],
                motility["linear_acc"], motility["angular_acc"],
                motility["rel_linear_vel"], motility["rel_angular_vel"],
                motility["rel_linear_acc"], motility["rel_angular_acc"],
                motility["rel_directionality"],
                self.structure, self.intensity,
            ]) if n else np.zeros((len(VOXEL_STATS), 0), np.float32)
        self.motility = motility

    # vec01/vec12 (PHYSICAL units) are only consumed by the node level —
    # lazily pulled from the device handles so the default skip_nodes run
    # never pays the (N, d) round trips
    @property
    def vec01(self) -> np.ndarray:
        if self._vec01_np is None:
            if self._vec01_px_dev is not None:
                self._vec01_np = (np.asarray(transfer.trim_leading(
                    self._vec01_px_dev, self._n))[: self._n]
                                  * self._spacing).astype(np.float32)
            else:
                self._vec01_np = np.full(
                    (self._n, self.coords.shape[1]), np.nan, np.float32)
        return self._vec01_np

    @property
    def vec12(self) -> np.ndarray:
        if self._vec12_np is None:
            if self._vec12_px_dev is not None:
                self._vec12_np = (np.asarray(transfer.trim_leading(
                    self._vec12_px_dev, self._n))[: self._n]
                                  * self._spacing).astype(np.float32)
            else:
                self._vec12_np = np.full(
                    (self._n, self.coords.shape[1]), np.nan, np.float32)
        return self._vec12_np

    def columns(self) -> dict:
        cols = {}
        for k in VOXEL_STATS[:9]:
            cols[f"{k}_raw"] = self.motility[k]
        cols["structure_raw"] = self.structure
        cols["intensity_raw"] = self.intensity
        cols["x_raw"] = self.x
        cols["y_raw"] = self.y
        cols["z_raw"] = self.z
        return cols


class _NodeLevel:
    """Skeleton-voxel ("node") features: radius-box voxel membership,
    flow divergence/convergence, thickness. Optional (skip_nodes).

    All membership-weighted statistics reduce ON DEVICE in one program
    (:func:`_node_agg_scan_kernel`) — only (stat, node) results are
    pulled.  The (node, voxel) pair lists themselves are needed only for
    the ``adjacency_maps`` artifact; they are computed entirely on host
    (:func:`_host_box_pairs`) on the hierarchy's background worker, off
    the frame critical path.  Tiny frames (mask < ~4M elements) use a
    dense numpy path — it doubles as the cross-implementation oracle."""

    # below this many mask elements a host dense mask beats a dispatch
    HOST_CUTOVER_MASK = 1 << 22

    def __init__(self, h: "Hierarchy", t: int, vox: _VoxelLevel):
        self.t = t
        pixel_class = np.asarray(h.im_pixel_class[t])
        self.nodes = np.argwhere(pixel_class > 0)
        m = len(self.nodes)
        at = tuple(self.nodes.T)
        self.component_label = np.asarray(h.label_components[t])[at].astype(np.int64)
        self.branch_label = np.asarray(h.label_branches[t])[at].astype(np.int64)

        # radius boxes from the distance image at each skeleton voxel
        radius = np.asarray(h.im_distance[t])[at].astype(np.float64)
        shape = self._frame_shape = pixel_class.shape
        lo = np.empty((m, len(shape)), np.int32)
        hi = np.empty((m, len(shape)), np.int32)
        for dim in range(len(shape)):
            lo[:, dim] = np.clip((self.nodes[:, dim] - radius).astype(int), 0, shape[dim])
            hi[:, dim] = np.clip((self.nodes[:, dim] + radius).astype(int) + 1, 0, shape[dim])

        spacing = np.asarray(h.spacing, np.float64)
        self.node_thickness = h._border_distance_cached(t, self.nodes) * 2.0

        c_total = len(vox.coords)
        if m and c_total:
            if m * c_total <= self.HOST_CUTOVER_MASK:
                agg = self._host_aggregate(h, lo, hi, vox, m)
            else:
                agg = self._device_aggregate(h, lo, hi, vox, m)
            conv, div, coord_means, vox_agg = agg
            self.convergence = conv
            self.divergence = div
            self.vergere = self.convergence + self.divergence
            if h.im_info.no_z:
                self.z = np.full(m, np.nan)
                self.y = coord_means[0] * spacing[0]
                self.x = coord_means[1] * spacing[1]
            else:
                self.z = coord_means[0] * spacing[0]
                self.y = coord_means[1] * spacing[1]
                self.x = coord_means[2] * spacing[2]
        else:
            nanm = np.full(m, np.nan)
            self.convergence = nanm.copy()
            self.divergence = nanm.copy()
            self.vergere = nanm.copy()
            self.z = nanm.copy()
            self.y = nanm.copy()
            self.x = nanm.copy()
            vox_agg = {k: np.full((len(VOXEL_STATS), m), np.nan) for k in STAT_KEYS}
            self._submit_pairs(h, np.zeros(0, np.int32), np.zeros(0, np.int32))
        self.aggregate_voxel_metrics = vox_agg

        self.stats = np.stack([
            np.asarray(self.divergence, np.float64),
            np.asarray(self.convergence, np.float64),
            np.asarray(self.vergere, np.float64),
            np.asarray(self.node_thickness, np.float64),
        ]) if m else np.zeros((len(NODE_STATS), 0))

    # -- adjacency pair sink ------------------------------------------------
    def _submit_pairs(self, h, pair_node, pair_vox):
        """Record this frame's sorted v_n edge list in the hierarchy's
        per-frame result dict (reassembled in frame order at the end)."""
        sink = getattr(h, "_vn_results", None)
        if sink is None:
            return
        order = np.lexsort((pair_node, pair_vox))
        sink[self.t] = np.column_stack(
            (pair_vox[order], pair_node[order])).astype(np.int64)

    # -- host (oracle / tiny-frame) path ------------------------------------
    def _host_aggregate(self, h, lo, hi, vox, m):
        coords = vox.coords
        mask = np.logical_and.reduce(
            [(lo[:, None, d_] <= coords[None, :, d_])
             & (coords[None, :, d_] <= hi[:, None, d_])
             for d_ in range(lo.shape[1])])
        pair_node, pair_vox = (a.astype(np.int32) for a in np.nonzero(mask))
        self._submit_pairs(h, pair_node, pair_vox)

        if not len(pair_node):
            nanm = np.full(m, np.nan)
            return (nanm.copy(), nanm.copy(),
                    np.full((lo.shape[1], m), np.nan),
                    {k: np.full((len(VOXEL_STATS), m), np.nan) for k in STAT_KEYS})
        dvec = (coords[pair_vox] - self.nodes[pair_node]).astype(np.float64)
        mag = np.linalg.norm(dvec, axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            direction = np.divide(dvec, mag, out=np.full_like(dvec, np.nan),
                                  where=mag != 0)
        dot01 = np.sum(vox.vec01[pair_vox] * direction, axis=1)
        dot12 = np.sum(vox.vec12[pair_vox] * direction, axis=1)
        pair_vals = np.concatenate(
            [dot01[None], dot12[None], coords[pair_vox].T.astype(np.float32)])
        agg = segment_nanstats(pair_vals, pair_node, m)
        means = agg["mean"]
        vox_agg = segment_nanstats_gathered(vox.stats, pair_vox, pair_node, m)
        return means[0], means[1], means[2:], vox_agg

    # -- device path ---------------------------------------------------------
    def _device_aggregate(self, h, lo, hi, vox, m):
        d = lo.shape[1]
        c_total = len(vox.coords)
        s = len(VOXEL_STATS)
        max_elems = h.max_node_mask_elems // (4 if h.low_memory else 1)
        chunk = int(max(1, min(h.node_chunk_size or 65536, max_elems // max(m, 1))))
        chunk = _bucket(min(chunk, c_total), 128)
        mb = _bucket(m, 128)
        n_chunks = (c_total + chunk - 1) // chunk

        # pad nodes with empty boxes (lo > hi never matches)
        lo_p = np.ones((mb, d), np.int32)
        lo_p[:m] = lo
        hi_p = np.zeros((mb, d), np.int32)
        hi_p[:m] = hi
        nc_p = np.zeros((mb, d), np.float32)
        nc_p[:m] = self.nodes

        def chunked(arr, fill, dtype):
            out = np.full((n_chunks * chunk,) + arr.shape[1:], fill, dtype)
            out[:c_total] = arr
            return out.reshape((n_chunks, chunk) + arr.shape[1:])

        coords_chunks = chunked(vox.coords.astype(np.int32), -1, np.int32)
        vec01_chunks = chunked(vox.vec01, np.nan, np.float32)
        vec12_chunks = chunked(vox.vec12, np.nan, np.float32)
        stats_pad = np.full((s, n_chunks * chunk), np.nan, np.float32)
        stats_pad[:, :c_total] = vox.stats
        stats_chunks = np.moveaxis(
            stats_pad.reshape(s, n_chunks, chunk), 1, 0)

        lo_d = jnp.asarray(lo_p)
        hi_d = jnp.asarray(hi_p)
        chunks_d = jnp.asarray(coords_chunks)
        node_sums, stat_sums = _node_agg_scan_kernel(
            lo_d, hi_d, jnp.asarray(nc_p), chunks_d,
            jnp.asarray(vec01_chunks), jnp.asarray(vec12_chunks),
            jnp.asarray(stats_chunks))

        # adjacency pairs: pure-host searchsorted range queries over the
        # already-host coords (background worker; zero device traffic)
        if getattr(h, "_vn_results", None) is not None:
            self._submit_host_pairs(h, lo, hi, vox.coords)

        node_sums = np.asarray(node_sums, np.float64)[:, :m]
        stat_sums = np.asarray(stat_sums, np.float64)[:, :, :m]
        c01, s01, c12, s12, cm = node_sums[:5]
        scoords = node_sums[5:]
        with np.errstate(invalid="ignore", divide="ignore"):
            conv = np.where(c01 > 0, s01 / np.maximum(c01, 1.0), np.nan)
            div = np.where(c12 > 0, s12 / np.maximum(c12, 1.0), np.nan)
            coord_means = np.where(cm[None] > 0, scoords / np.maximum(cm[None], 1.0),
                                   np.nan)
            cnt_s, sum_s, mn_s, mx_s, ssq_s = stat_sums
            empty = cnt_s == 0
            nanw = np.full_like(cnt_s, np.nan)
            vox_agg = {
                "mean": np.where(empty, nanw, sum_s / np.maximum(cnt_s, 1.0)),
                "std_dev": np.where(empty, nanw,
                                    np.sqrt(np.maximum(ssq_s / np.maximum(cnt_s, 1.0), 0.0))),
                "min": np.where(empty, nanw, mn_s),
                "max": np.where(empty, nanw, mx_s),
                "sum": np.where(empty, nanw, sum_s),
            }
        return conv, div, coord_means, vox_agg

    def _submit_host_pairs(self, h, lo, hi, coords):
        pool = getattr(h, "_pool", None)
        shape = self._frame_shape

        def job():
            pair_node, pair_vox = _host_box_pairs(lo, hi, coords, shape)
            self._submit_pairs(h, pair_node, pair_vox)

        if pool is not None:
            pool.submit(job)
        else:
            job()

    def columns(self) -> dict:
        cols = _agg_columns(VOXEL_STATS, self.aggregate_voxel_metrics)
        for k, v in (("divergence", self.divergence), ("convergence", self.convergence),
                     ("vergere", self.vergere), ("node_thickness", self.node_thickness),
                     ("x", self.x), ("y", self.y), ("z", self.z)):
            cols[f"{k}_raw"] = np.asarray(v, float)
        return cols


class _BranchLevel:
    """Branch features: centerline length (stencil kernel), thickness
    (MXU border distance), tortuosity, region morphology."""

    def __init__(self, h: "Hierarchy", t: int, vox: _VoxelLevel, nodes):
        self.t = t
        skel = np.asarray(h.im_skel[t])
        skel_coords = np.argwhere(skel > 0)
        skel_labels = skel[tuple(skel_coords.T)].astype(np.int64)
        row_labels, first_idx = np.unique(skel_labels, return_index=True)
        keep = row_labels > 0
        row_labels, first_idx = row_labels[keep], first_idx[keep]
        self.branch_label = row_labels
        b = len(row_labels)
        first_coords = skel_coords[first_idx] if b else np.zeros((0, skel.ndim), int)
        self.component_label = (
            np.asarray(h.label_components[t])[tuple(first_coords.T)].astype(np.int64)
            if b else np.zeros(0, np.int64))

        # child aggregations (the voxel stats matrix is reused from HBM)
        self.aggregate_voxel_metrics = segment_nanstats(
            vox.stats, _ids_into(vox.branch_labels, row_labels), b,
            values_dev=vox.stats_dev)
        self.aggregate_node_metrics = None
        if nodes is not None:
            self.aggregate_node_metrics = segment_nanstats(
                nodes.stats, _ids_into(nodes.branch_label, row_labels), b)

        spacing = np.asarray(h.spacing, np.float64)
        if b:
            # skeleton volume from the fused loop's device cache when the
            # same process produced it (zero link bytes); degree gathered
            # at the skeleton coords on device (vs a full-volume pull)
            lengths_all, deg_at = branch_geometry(
                skel, spacing, coords=skel_coords, skel_dev=h._skel_dev(t))
            lengths = lengths_all[row_labels].astype(np.float64)

            radii = h._border_distance_cached(t, skel_coords)
            rows = _ids_into(skel_labels, row_labels)

            # tip length corrections (hierarchical.py:1694-1713)
            tips = deg_at == 1
            lone = deg_at == 0
            np.add.at(lengths, rows[lone], 2.0 * radii[lone])
            np.add.at(lengths, rows[tips], radii[tips])

            # median thickness per branch: values sorted within each
            # label run, median = mean of the two middle elements
            thickness = np.full(b, np.nan)
            order = np.lexsort((radii * 2.0, skel_labels))
            sl, st = skel_labels[order], (radii * 2.0)[order]
            starts = np.searchsorted(sl, row_labels)
            ends = np.searchsorted(sl, row_labels, side="right")
            run = ends - starts
            has = run > 0
            mid_lo = starts + np.maximum(run - 1, 0) // 2
            mid_hi = starts + np.maximum(run, 1) // 2
            thickness[has] = 0.5 * (st[np.minimum(mid_lo[has], len(st) - 1)]
                                    + st[np.minimum(mid_hi[has], len(st) - 1)])

            swap = (~np.isnan(thickness)) & (thickness > lengths)
            thickness[swap], lengths[swap] = lengths[swap], thickness[swap].copy()
            with np.errstate(divide="ignore", invalid="ignore"):
                aspect = np.where(thickness != 0, lengths / thickness, np.nan)

            # tortuosity: length / tip-to-tip distance (first two tips)
            tortuosity = np.ones(b)
            tip_rows = rows[tips]
            tip_coords = skel_coords[tips]
            torder = np.argsort(tip_rows, kind="stable")
            tr, tc = tip_rows[torder], tip_coords[torder]
            tstarts = np.searchsorted(tr, np.arange(b))
            tends = np.searchsorted(tr, np.arange(b), side="right")
            two = np.nonzero((tends - tstarts) >= 2)[0]
            if len(two):
                p0 = tc[tstarts[two]]
                p1 = tc[tstarts[two] + 1]
                tip_dist = np.sqrt(np.sum(((p0 - p1) * spacing) ** 2, axis=1))
                pos = tip_dist > 0
                tortuosity[two[pos]] = lengths[two[pos]] / tip_dist[pos]

            self.branch_length = lengths
            self.branch_thickness = thickness
            self.branch_aspect_ratio = aspect
            self.branch_tortuosity = tortuosity
        else:
            empty = np.zeros(0)
            self.branch_length = empty
            self.branch_thickness = empty.copy()
            self.branch_aspect_ratio = empty.copy()
            self.branch_tortuosity = empty.copy()

        # region morphology over the full-volume branch labels (native
        # dtype — an int64 astype here would copy the whole 4.2 Mvox
        # frame; the per-voxel consumers cast their own gathers)
        label_branches = np.asarray(h.label_branches[t])
        props = {r.label: r for r in regionprops(label_branches, spacing=tuple(spacing))}
        self._fill_regionprops(props, row_labels, "branch")

        if h.im_branch_reassigned is not None and not h.im_info.no_t:
            fg = label_branches > 0
            self.reassigned_label = _majority_by_label(
                label_branches[fg], np.asarray(h.im_branch_reassigned[t])[fg], row_labels)
        else:
            self.reassigned_label = np.full(b, np.nan)

        self.stats = np.stack([
            self.branch_length, self.branch_thickness, self.branch_aspect_ratio,
            self.branch_tortuosity, self.branch_area, self.branch_axis_length_maj,
            self.branch_axis_length_min, self.branch_extent, self.branch_solidity,
        ]).astype(np.float64) if b else np.zeros((len(BRANCH_STATS), 0))

    def _fill_regionprops(self, props, row_labels, prefix):
        n = len(row_labels)
        area = np.full(n, np.nan)
        maj = np.full(n, np.nan)
        mino = np.full(n, np.nan)
        extent = np.full(n, np.nan)
        solidity = np.full(n, np.nan)
        z = np.full(n, np.nan)
        y = np.full(n, np.nan)
        x = np.full(n, np.nan)
        for i, lbl in enumerate(row_labels):
            r = props.get(int(lbl))
            if r is None:
                continue
            area[i] = r.area
            maj[i] = r.major_axis_length
            mino[i] = r.minor_axis_length
            extent[i] = r.extent
            solidity[i] = r.solidity
            if len(r.centroid) == 3:
                z[i], y[i], x[i] = r.centroid
            else:
                y[i], x[i] = r.centroid
        setattr(self, f"{prefix}_area", area)
        setattr(self, f"{prefix}_axis_length_maj", maj)
        setattr(self, f"{prefix}_axis_length_min", mino)
        setattr(self, f"{prefix}_extent", extent)
        setattr(self, f"{prefix}_solidity", solidity)
        self.z, self.y, self.x = z, y, x

    def columns(self, skip_nodes: bool) -> dict:
        cols = {}
        if not skip_nodes and self.aggregate_node_metrics is not None:
            cols.update(_agg_columns(NODE_STATS, self.aggregate_node_metrics))
        cols.update(_agg_columns(VOXEL_STATS, self.aggregate_voxel_metrics))
        for k in BRANCH_STATS:
            cols[f"{k}_raw"] = np.asarray(getattr(self, k), float)
        cols["reassigned_label_raw"] = np.asarray(self.reassigned_label, float)
        cols["x_raw"] = self.x
        cols["y_raw"] = self.y
        cols["z_raw"] = self.z
        return cols


class _ComponentLevel(_BranchLevel):
    """Organelle features: morphology + aggregations of every lower level."""

    def __init__(self, h: "Hierarchy", t: int, vox: _VoxelLevel, nodes, branches):
        self.t = t
        label_frame = np.asarray(h.label_components[t]).astype(np.int64)
        row_labels = np.unique(label_frame[label_frame > 0])
        self.component_label = row_labels
        o = len(row_labels)

        self.aggregate_voxel_metrics = segment_nanstats(
            vox.stats, _ids_into(vox.component_labels, row_labels), o,
            values_dev=vox.stats_dev)
        self.aggregate_node_metrics = None
        if nodes is not None:
            self.aggregate_node_metrics = segment_nanstats(
                nodes.stats, _ids_into(nodes.component_label, row_labels), o)
        self.aggregate_branch_metrics = segment_nanstats(
            branches.stats, _ids_into(branches.component_label, row_labels), o)

        spacing = tuple(float(s) for s in h.spacing)
        props = {r.label: r for r in regionprops(label_frame, spacing=spacing)}
        self._fill_regionprops(props, row_labels, "organelle")

        if h.im_obj_reassigned is not None and not h.im_info.no_t:
            fg = label_frame > 0
            self.reassigned_label = _majority_by_label(
                label_frame[fg], np.asarray(h.im_obj_reassigned[t])[fg], row_labels)
        else:
            self.reassigned_label = np.full(o, np.nan)

        self.stats = np.stack([
            self.organelle_area, self.organelle_axis_length_maj,
            self.organelle_axis_length_min, self.organelle_extent,
            self.organelle_solidity,
        ]).astype(np.float64) if o else np.zeros((len(ORGANELLE_STATS), 0))

    def columns(self, skip_nodes: bool) -> dict:
        cols = {}
        if not skip_nodes and self.aggregate_node_metrics is not None:
            cols.update(_agg_columns(NODE_STATS, self.aggregate_node_metrics))
        cols.update(_agg_columns(VOXEL_STATS, self.aggregate_voxel_metrics))
        cols.update(_agg_columns(BRANCH_STATS, self.aggregate_branch_metrics))
        for k in ORGANELLE_STATS:
            cols[f"{k}_raw"] = np.asarray(getattr(self, k), float)
        cols["reassigned_label_raw"] = np.asarray(self.reassigned_label, float)
        cols["x_raw"] = self.x
        cols["y_raw"] = self.y
        cols["z_raw"] = self.z
        return cols


def _image_columns(vox, nodes, branches, components, skip_nodes: bool) -> dict:
    """Whole-frame aggregations — one segment with everything in it."""
    def whole(stats, names):
        n = stats.shape[1]
        agg = segment_nanstats(stats, np.zeros(n, np.int32), 1)
        return _agg_columns(names, agg)

    cols = {}
    if not skip_nodes and nodes is not None:
        cols.update(whole(nodes.stats, NODE_STATS))
    cols.update(whole(vox.stats, VOXEL_STATS))
    cols.update(whole(branches.stats, BRANCH_STATS))
    cols.update(whole(components.stats, ORGANELLE_STATS))
    return cols


class _AsyncWorker:
    """One background thread draining callables in FIFO order.

    Frame t's host-side finalisation work — CSV formatting and
    adjacency pair extraction (_host_box_pairs) — runs here, overlapping frame t+1's
    device compute.  A single thread keeps append order; the first
    exception re-raises at :meth:`close`."""

    def __init__(self):
        import queue
        import threading

        self._q = queue.Queue(maxsize=16)
        self._exc = None
        self._thread = threading.Thread(
            target=self._work, name="nellie-hier-worker", daemon=True)
        self._thread.start()

    def _work(self):
        while True:
            job = self._q.get()
            if job is None:
                return
            try:
                job()
            except Exception as exc:  # noqa: BLE001 — re-raised at close
                if self._exc is None:
                    self._exc = exc

    def submit(self, fn):
        if self._exc is not None:
            raise self._exc
        self._q.put(fn)

    def close(self):
        self._q.put(None)
        self._thread.join()
        if self._exc is not None:
            raise self._exc


try:  # pyarrow's C++ CSV writer is ~5x pandas here — the hierarchy's
    # wall clock at bench size is formatting-bound, not compute-bound
    import pyarrow as _pa
    import pyarrow.csv as _pacsv
except Exception:  # noqa: BLE001 — optional; pandas fallback below
    _pa = None


def _write_csv_rows(path, data: dict, first: bool):
    """Append one frame's rows. pyarrow formats NaN as null -> "" and
    floats shortest-round-trip, matching pandas' parse-equal output
    (measured max relative drift ~1e-11, far under the 1e-4 feature
    parity tolerance)."""
    if _pa is not None:
        try:
            table = _pa.table(
                {k: _pa.array(v, from_pandas=True) for k, v in data.items()})
            import io

            buf = io.BytesIO()
            _pacsv.write_csv(
                table, buf, _pacsv.WriteOptions(include_header=first))
            with open(path, "wb" if first else "ab") as f:
                f.write(buf.getvalue())
            return
        except (_pa.ArrowInvalid, _pa.ArrowNotImplementedError):
            pass  # odd dtype (object column etc.) — pandas handles it
    pd.DataFrame(data).to_csv(
        path, index=False, mode="w" if first else "a", header=first)


class _CsvStream:
    """Per-frame append writer with a stable header (writes ride the
    shared background worker when one is given)."""

    def __init__(self, path, pool: "_AsyncWorker | None" = None):
        self.path = path
        self.first = True
        self.pool = pool

    def write(self, t, labels, cols: dict):
        n = len(labels)
        data = {"t": np.full(n, t, np.int64), "label": np.asarray(labels)}
        for k, v in cols.items():
            # force host numpy now: a stray device array would pull
            # per-column during formatting (measured 8 ms per pull on
            # the tunnelled link)
            data[k] = np.asarray(v)
        path, first = self.path, self.first
        if self.pool is not None:
            self.pool.submit(lambda: _write_csv_rows(path, data, first))
        else:
            _write_csv_rows(path, data, first)
        self.first = False


class Hierarchy:
    """Frame-major feature extraction orchestrator (public API matches the
    reference class: construct with ImInfo + flags, call run())."""

    def __init__(
        self,
        im_info: ImInfo,
        skip_nodes: bool = True,
        viewer=None,
        use_gpu: bool = True,
        low_memory: bool = False,
        enable_motility: bool = True,
        enable_adjacency: bool = True,
        device=None,
        node_chunk_size=None,
        max_node_mask_elems: int = int(5e7),
        mesh=None,
    ):
        self.im_info = im_info
        self.mesh = mesh
        self._border_cache = {}
        self._border_cache_lock = threading.Lock()
        self.num_t = self.im_info.shape[0]
        if self.im_info.no_z:
            self.spacing = (self.im_info.dim_res["Y"], self.im_info.dim_res["X"])
        else:
            self.spacing = (self.im_info.dim_res["Z"], self.im_info.dim_res["Y"],
                            self.im_info.dim_res["X"])

        self.skip_nodes = skip_nodes
        self.viewer = viewer
        self.low_memory = low_memory
        self.enable_motility = enable_motility
        self.enable_adjacency = enable_adjacency
        self.device = (device or "auto").lower()
        self.node_chunk_size = node_chunk_size
        self.max_node_mask_elems = int(max_node_mask_elems)

        self.im_raw = None
        self.im_struct = None
        self.im_distance = None
        self.im_skel = None
        self.im_pixel_class = None
        self.label_components = None
        self.label_branches = None
        self.im_border_mask = None
        self.im_obj_reassigned = None
        self.im_branch_reassigned = None
        self.flow_interpolator_fw = None
        self.flow_interpolator_bw = None

    def _get_t(self):
        if self.num_t is None and not self.im_info.no_t:
            self.num_t = self.im_info.shape[self.im_info.axes.index("T")]
        if self.num_t is None:
            self.num_t = 1
        return self.num_t

    def _allocate_memory(self):
        pp = self.im_info.pipeline_paths
        self.im_raw = self.im_info.get_memmap(self.im_info.im_path)
        self.im_struct = self.im_info.get_memmap(pp["im_preprocessed"])
        self.im_distance = self.im_info.get_memmap(pp["im_distance"])
        self.im_skel = self.im_info.get_memmap(pp["im_skel"])
        self.label_components = self.im_info.get_memmap(pp["im_instance_label"])
        self.label_branches = self.im_info.get_memmap(pp["im_skel_relabelled"])
        self.im_border_mask = self.im_info.get_memmap(pp["im_border"])
        self.im_pixel_class = self.im_info.get_memmap(pp["im_pixel_class"])

        self.im_obj_reassigned = None
        self.im_branch_reassigned = None
        if not self.im_info.no_t:
            obj_path = pp.get("im_obj_label_reassigned")
            br_path = pp.get("im_branch_label_reassigned")
            if obj_path and br_path and os.path.exists(obj_path) and os.path.exists(br_path):
                self.im_obj_reassigned = self.im_info.get_memmap(obj_path)
                self.im_branch_reassigned = self.im_info.get_memmap(br_path)

    def _status(self, msg):
        if self.viewer is not None:
            self.viewer.status = msg

    def _skel_dev(self, t):
        """The frame's skeleton volume left in HBM by the fused
        segmentation loop (utils/device_cache), or None when this stage
        runs standalone.  Popped — Hierarchy is its last consumer."""
        if self.mesh is not None:
            # mesh frame-parallel builds run on round-robined devices;
            # a cached array pinned to device 0 would drag every kernel
            # back there
            return None
        from nellie_tpu.utils.device_cache import frame_cache

        cache = frame_cache(self.im_info)
        return cache.take("im_skel", t) if cache is not None else None

    def _border_distance_cached(self, t, coords):
        """Border distance at skeleton coordinates.  Nodes query
        pixel_class>0 and Branches query im_skel>0 — NEARLY but not
        exactly the same voxel set — so the first call computes one MXU
        NN pass over the union (pixel_class>0 | im_skel>0) and both
        consumers look their subset up by raveled index.  Keyed by t
        (frames may be built concurrently); evicted at last consume —
        one consumer (Branches) under skip_nodes, two otherwise.  The
        per-entry lock keeps concurrent frame builders from computing
        the same frame's pass twice; the whole cache is also cleared at
        the end of the run (branch-less frames never hit the branch
        consume)."""
        coords = np.asarray(coords)
        shape = self.im_border_mask[t].shape
        cache = self._border_cache
        with self._border_cache_lock:
            entry = cache.get(t)
            if entry is None:
                entry = cache[t] = [None, [0], threading.Lock()]
        slot, consumed, entry_lock = entry
        with entry_lock:
            if entry[0] is None:
                # skip_nodes: only Branches consume (im_skel coords) — no
                # need to read or union the pixel_class frame
                union = np.asarray(self.im_skel[t]) > 0
                if not self.skip_nodes:
                    union = union | (np.asarray(self.im_pixel_class[t]) > 0)
                ucoords = np.argwhere(union)
                udist = border_distance(
                    np.asarray(self.im_border_mask[t]) > 0, ucoords, self.spacing)
                entry[0] = (np.ravel_multi_index(tuple(ucoords.T), shape), udist)
        ravel, udist = entry[0]
        with self._border_cache_lock:
            consumed[0] += 1
            if consumed[0] >= (1 if self.skip_nodes else 2):
                cache.pop(t, None)
        if coords.size == 0:
            return np.zeros((0,), np.float32)
        pos = np.searchsorted(ravel, np.ravel_multi_index(tuple(coords.T), shape))
        # every query voxel is in the union by construction
        return udist[pos]

    def _run_hierarchy(self):
        self._get_t()
        if (self.enable_motility and not self.im_info.no_t
                and self.num_t is not None and self.num_t > 1):
            self.flow_interpolator_fw = FlowInterpolator(self.im_info)
            self.flow_interpolator_bw = FlowInterpolator(self.im_info, forward=False)
        else:
            self.flow_interpolator_fw = None
            self.flow_interpolator_bw = None

        self._allocate_memory()
        pp = self.im_info.pipeline_paths
        pool = _AsyncWorker()
        writers = {
            "voxels": _CsvStream(pp["features_voxels"], pool),
            "branches": _CsvStream(pp["features_branches"], pool),
            "organelles": _CsvStream(pp["features_organelles"], pool),
            "image": _CsvStream(pp["features_image"], pool),
        }
        if not self.skip_nodes:
            writers["nodes"] = _CsvStream(pp["features_nodes"], pool)

        adjacency = {"v_b": [], "v_n": [], "v_o": [], "n_b": [], "n_o": [], "b_o": []}
        # v_n pair lists are produced by _NodeLevel through the background
        # worker (host searchsorted range queries, off the critical path);
        # keyed by t and reassembled in order below
        self._pool = pool
        self._interp_lock = threading.Lock()
        self._vn_results = ({} if self.enable_adjacency and not self.skip_nodes
                            else None)

        mesh_devs = (list(self.mesh.devices.flatten())
                     if self.mesh is not None else None)
        if mesh_devs is not None and len(mesh_devs) < 2:
            mesh_devs = None

        def build(t):
            if mesh_devs is not None:
                # frame-parallel over the mesh: each frame's kernels run
                # on its own device (jax.default_device is thread-local)
                with jax.default_device(mesh_devs[t % len(mesh_devs)]):
                    return _build_levels(t)
            return _build_levels(t)

        def _build_levels(t):
            vox = _VoxelLevel(self, t)
            nodes = None if self.skip_nodes else _NodeLevel(self, t, vox)
            branches = _BranchLevel(self, t, vox, nodes)
            components = _ComponentLevel(self, t, vox, nodes, branches)
            # materialise every CSV column here, on the build worker: the
            # device pulls inside columns()/_image_columns then overlap
            # frame t+1's compute instead of blocking the strictly-ordered
            # writer loop (profiled at ~0.8 s/frame of main-loop stall)
            cols = {
                "voxels": vox.columns(),
                "branches": branches.columns(self.skip_nodes),
                "organelles": components.columns(self.skip_nodes),
                "image": _image_columns(vox, nodes, branches, components,
                                        self.skip_nodes),
            }
            if nodes is not None:
                cols["nodes"] = nodes.columns()
            return vox, nodes, branches, components, cols

        # frames are independent: build a couple concurrently so frame
        # t+1's host gathers and device dispatches overlap frame t's
        # (width = mesh device count when a mesh is given); results are
        # consumed (CSV, adjacency) strictly in frame order
        if self.low_memory:
            workers = 1
        elif mesh_devs is not None:
            workers = min(len(mesh_devs), self.num_t)
        else:
            # three in flight: frame t's pulls + CSV prep overlap t+1's
            # device kernels AND t+2's host gathers (each frame holds a
            # few tens of MB of stat tables — cheap next to the memmaps)
            workers = min(3, self.num_t)
        executor = (ThreadPoolExecutor(max_workers=workers,
                                       thread_name_prefix="nellie-hier-frame")
                    if workers > 1 else None)
        futures = {}

        def result(t):
            if executor is None:
                return build(t)
            for ahead in range(t, min(t + workers + 1, self.num_t)):
                if ahead not in futures:
                    futures[ahead] = executor.submit(build, ahead)
            return futures.pop(t).result()

        try:
            for t in range(self.num_t):
                self._status(f"Extracting features. Frame: {t + 1} of {self.num_t}.")
                logger.info("Hierarchy: frame %d/%d", t + 1, self.num_t)
                vox, nodes, branches, components, cols = result(t)

                n_vox = len(vox.coords)
                writers["voxels"].write(t, np.arange(n_vox, dtype=np.int64),
                                        cols["voxels"])
                if nodes is not None:
                    writers["nodes"].write(
                        t, np.arange(len(nodes.nodes), dtype=np.int64),
                        cols["nodes"])
                writers["branches"].write(t, branches.branch_label,
                                          cols["branches"])
                writers["organelles"].write(t, components.component_label,
                                            cols["organelles"])
                writers["image"].write(t, np.zeros(1, np.int64), cols["image"])

                if self.enable_adjacency:
                    self._collect_adjacency(adjacency, vox, nodes, branches, components)

            self._status("Finalizing run.")
        finally:
            for f in futures.values():
                f.cancel()
            if executor is not None:
                executor.shutdown(wait=True)
            pool.close()
            self._border_cache.clear()
        if self._vn_results is not None:
            adjacency["v_n"] = [self._vn_results[t] for t in range(self.num_t)]
        if self.enable_adjacency:
            with open(pp["adjacency_maps"], "wb") as f:
                pickle.dump(adjacency, f)
        self._status("Done!")

    @staticmethod
    def _label_edges(member_labels, level_labels):
        """(member_idx, level_row) pairs for members whose label appears in
        the level's row labels."""
        idx = _ids_into(member_labels, np.asarray(level_labels, np.int64))
        ok = idx >= 0
        return np.column_stack((np.nonzero(ok)[0], idx[ok])).astype(np.int64)

    def _collect_adjacency(self, adjacency, vox, nodes, branches, components):
        """Sparse edge lists, same key layout and index conventions as the
        reference's pickled maps (hierarchical.py:433-609)."""
        mask_b = vox.branch_labels > 0
        adjacency["v_b"].append(
            np.column_stack((np.nonzero(mask_b)[0], vox.branch_labels[mask_b] - 1))
            if mask_b.any() else np.zeros((0, 2), np.int64))
        mask_o = vox.component_labels > 0
        adjacency["v_o"].append(
            np.column_stack((np.nonzero(mask_o)[0], vox.component_labels[mask_o]))
            if mask_o.any() else np.zeros((0, 2), np.int64))
        if nodes is not None:
            # v_n was already queued by _NodeLevel via the background worker
            adjacency["n_b"].append(
                self._label_edges(nodes.branch_label, branches.branch_label))
            adjacency["n_o"].append(
                self._label_edges(nodes.component_label, components.component_label))
        adjacency["b_o"].append(
            self._label_edges(branches.component_label, components.component_label))

    def run(self):
        def attempt(dev, low):
            self.low_memory = low
            self._run_hierarchy()

        adaptive_run.run_with_ladder("Hierarchy", self.device, self.low_memory,
                                     self.im_info, attempt)
