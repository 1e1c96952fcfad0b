"""On-device per-group (segment) statistics and branch geometry.

The reference Hierarchy's hot spot is per-label aggregation: a padded
index matrix of group members is gathered on host for every statistic
(``/root/reference/nellie/feature_extraction/hierarchical.py:1165-1272``).
Here every per-group nan-aware mean/std/min/max/sum is an XLA segment
reduction over a flat value vector — the whole stat bundle for a frame
is one jitted call (vmapped across statistics), so a million voxels x
eleven statistics aggregate in a couple of HBM passes on the VPU.

Also here: the branch centerline length + same-label neighbour degree
stencil (the reference's half-neighbourhood offset sweep,
``hierarchical.py:1515-1630``) as a jitted static-shift kernel whose
per-label totals are a single segment_sum.
"""
from __future__ import annotations

import itertools
import math
from functools import partial
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

STAT_KEYS = ("mean", "std_dev", "min", "max", "sum")


def _bucket(n: int, minimum: int = 8) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@partial(jax.jit, static_argnames=("num_segments",))
def _segment_nanstats_kernel(values: jnp.ndarray, seg_ids: jnp.ndarray,
                             num_segments: int):
    """values (S, N) float32, seg_ids (N,) int32.

    Out-of-range ids (including negatives) fall into an overflow bucket
    that is sliced away; NaN values don't contribute. Returns a dict of
    (S, num_segments) arrays: mean, std_dev (population, two-pass
    centered), min, max, sum — NaN where a segment is empty.
    """
    ns = num_segments + 1
    in_range = (seg_ids >= 0) & (seg_ids < num_segments)
    sid = jnp.where(in_range, seg_ids, num_segments).astype(jnp.int32)

    def per_stat(v):
        valid = (~jnp.isnan(v)) & in_range
        v0 = jnp.where(valid, v, 0.0)
        cnt = jax.ops.segment_sum(valid.astype(jnp.float32), sid, ns)
        s = jax.ops.segment_sum(v0, sid, ns)
        mean = s / jnp.maximum(cnt, 1.0)
        centered = jnp.where(valid, v - mean[sid], 0.0)
        ss = jax.ops.segment_sum(centered * centered, sid, ns)
        var = jnp.maximum(ss / jnp.maximum(cnt, 1.0), 0.0)
        mn = jax.ops.segment_min(jnp.where(valid, v, jnp.inf), sid, ns)
        mx = jax.ops.segment_max(jnp.where(valid, v, -jnp.inf), sid, ns)
        empty = cnt == 0
        nan = jnp.float32(jnp.nan)
        return (
            jnp.where(empty, nan, mean)[:num_segments],
            jnp.where(empty, nan, jnp.sqrt(var))[:num_segments],
            jnp.where(empty, nan, mn)[:num_segments],
            jnp.where(empty, nan, mx)[:num_segments],
            jnp.where(empty, nan, s)[:num_segments],
        )

    mean, std, mn, mx, sm = jax.vmap(per_stat)(values)
    # one stacked output -> ONE device->host transfer for the whole bundle
    # (per-key pulls each pay the dispatch latency of the tunnelled link)
    return jnp.stack([mean, std, mn, mx, sm])


def group_stats_np(values: np.ndarray, seg_ids: np.ndarray,
                   num_segments: int) -> Dict[str, np.ndarray]:
    """Vectorised host implementation (bincount / ufunc.at), same
    semantics as the device kernel — used for small tables where a device
    round trip costs more than the reduction."""
    values = np.atleast_2d(np.asarray(values, np.float64))
    seg_ids = np.asarray(seg_ids, np.int64)
    s, n = values.shape
    out = {k: np.full((s, num_segments), np.nan) for k in STAT_KEYS}
    if num_segments == 0 or n == 0:
        return {k: v.astype(np.float32) for k, v in out.items()}
    in_range = (seg_ids >= 0) & (seg_ids < num_segments)
    for i in range(s):
        v = values[i]
        valid = in_range & ~np.isnan(v)
        sid = seg_ids[valid]
        vv = v[valid]
        cnt = np.bincount(sid, minlength=num_segments).astype(np.float64)
        sm = np.bincount(sid, weights=vv, minlength=num_segments)
        nonempty = cnt > 0
        mean = np.divide(sm, cnt, out=np.full(num_segments, np.nan), where=nonempty)
        centered = vv - mean[sid]
        ss = np.bincount(sid, weights=centered * centered, minlength=num_segments)
        var = np.divide(ss, cnt, out=np.full(num_segments, np.nan), where=nonempty)
        mn = np.full(num_segments, np.inf)
        mx = np.full(num_segments, -np.inf)
        np.minimum.at(mn, sid, vv)
        np.maximum.at(mx, sid, vv)
        out["mean"][i] = mean
        out["std_dev"][i] = np.sqrt(np.maximum(var, 0.0))
        out["min"][i] = np.where(nonempty, mn, np.nan)
        out["max"][i] = np.where(nonempty, mx, np.nan)
        out["sum"][i] = np.where(nonempty, sm, np.nan)
    return out


# below this many member rows the tunnelled dispatch latency exceeds the
# reduction cost; run on host instead
HOST_CUTOVER_N = 16384


def segment_nanstats(values: np.ndarray, seg_ids: np.ndarray,
                     num_segments: int, values_dev=None) -> Dict[str, np.ndarray]:
    """Bucket-pad N and num_segments (stable jit shapes), run the device
    kernel, slice back — or the vectorised host path for small tables.
    values (S, N); returns (S, num_segments) per stat key.

    ``values_dev``: optional device-resident (S, NB>=N) float32 matrix
    with NaN padding beyond N — when the producer (the hierarchy's
    per-frame stats bundle) already holds the values in HBM, passing it
    here skips the (S, N) re-upload; only the tiny segment-id vector
    crosses the link.  The host cutover still applies (and uses the host
    ``values``, which the caller has pulled for the CSV anyway)."""
    values = np.atleast_2d(np.asarray(values, np.float32))
    seg_ids = np.asarray(seg_ids, np.int32)
    s, n = values.shape
    if num_segments == 0:
        return {k: np.zeros((s, 0), np.float32) for k in STAT_KEYS}
    if n == 0:
        return {k: np.full((s, num_segments), np.nan, np.float32) for k in STAT_KEYS}
    # host path when the member table is small — or when there are only a
    # handful of segments (e.g. whole-image aggregation): a few bincounts
    # over N values beat a device dispatch + pull at any N
    if n < HOST_CUTOVER_N or num_segments <= 8:
        return group_stats_np(values, seg_ids, num_segments)
    gb = _bucket(num_segments, 8)
    if values_dev is not None and values_dev.shape[0] == s and values_dev.shape[1] >= n:
        nb = values_dev.shape[1]
        v_dev = values_dev
    else:
        nb = _bucket(n, 128)
        v = np.full((s, nb), np.nan, np.float32)
        v[:, :n] = values
        v_dev = jnp.asarray(v)
    ids = np.full((nb,), -1, np.int32)
    ids[:n] = seg_ids
    out = np.asarray(_segment_nanstats_kernel(v_dev, jnp.asarray(ids), gb))
    return {k: out[i][:, :num_segments] for i, k in enumerate(STAT_KEYS)}


def group_stats_host(values: np.ndarray, seg_ids: np.ndarray,
                     num_segments: int) -> Dict[str, np.ndarray]:
    """Pure-numpy oracle with identical semantics (parity tests; also the
    low-memory fallback when a frame is too large for device buffers)."""
    values = np.atleast_2d(np.asarray(values, np.float64))
    seg_ids = np.asarray(seg_ids, np.int64)
    s = values.shape[0]
    out = {k: np.full((s, num_segments), np.nan, np.float64) for k in STAT_KEYS}
    for g in range(num_segments):
        sel = seg_ids == g
        if not sel.any():
            continue
        v = values[:, sel]
        all_nan = np.isnan(v).all(axis=1)
        with np.errstate(invalid="ignore"):
            for k, fn in (("mean", np.nanmean), ("std_dev", np.nanstd),
                          ("min", np.nanmin), ("max", np.nanmax), ("sum", np.nansum)):
                col = np.full(s, np.nan)
                if (~all_nan).any():
                    col[~all_nan] = fn(v[~all_nan], axis=1)
                out[k][:, g] = col
    return out


# ---------------------------------------------------------------------------
# branch centerline geometry
# ---------------------------------------------------------------------------

def _half_offsets(ndim: int):
    """Lexicographically-positive neighbour offsets: 4 in 2D, 13 in 3D."""
    zero = (0,) * ndim
    return [off for off in itertools.product((-1, 0, 1), repeat=ndim)
            if off > zero]


def _shift(vol: jnp.ndarray, off) -> jnp.ndarray:
    """vol shifted so position v reads vol[v + off], zero-padded."""
    out = vol
    for axis, o in enumerate(off):
        if o == 0:
            continue
        pad = [(0, 0)] * vol.ndim
        if o > 0:
            sl = [slice(None)] * vol.ndim
            sl[axis] = slice(o, None)
            pad[axis] = (0, o)
        else:
            sl = [slice(None)] * vol.ndim
            sl[axis] = slice(None, o)
            pad[axis] = (-o, 0)
        out = jnp.pad(out[tuple(sl)], pad)
    return out


@partial(jax.jit, static_argnames=("spacing", "num_labels"))
def _branch_geometry_kernel(skel: jnp.ndarray, spacing: Tuple[float, ...],
                            num_labels: int):
    """Per-label centerline length + per-voxel same-label degree.

    For every half-neighbourhood offset, voxels whose neighbour carries
    the same nonzero label contribute one physical edge length to that
    label and one degree count to both endpoints — equivalent to the
    reference's per-offset slicing sweep (hierarchical.py:1530-1618) but
    fused: per-voxel length contributions accumulate in one plane and a
    single segment_sum produces all label totals.
    """
    ndim = skel.ndim
    skel = skel.astype(jnp.int32)
    fg = skel > 0
    length_acc = jnp.zeros(skel.shape, jnp.float32)
    degree = jnp.zeros(skel.shape, jnp.int32)
    for off in _half_offsets(ndim):
        neigh = _shift(skel, off)
        same = fg & (skel == neigh)
        edge_len = math.sqrt(sum((o * s) ** 2 for o, s in zip(off, spacing)))
        length_acc = length_acc + jnp.where(same, jnp.float32(edge_len), 0.0)
        degree = degree + same.astype(jnp.int32) + _shift(same, tuple(-o for o in off)).astype(jnp.int32)
    ids = jnp.where(fg, skel, num_labels).ravel()
    lengths = jax.ops.segment_sum(length_acc.ravel(), ids, num_labels + 1)[:num_labels]
    return lengths, degree.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("spacing", "num_labels"))
def _branch_geometry_at_kernel(skel, spacing, num_labels, coords):
    """Branch geometry with the degree volume gathered at ``coords`` on
    device — only (num_labels,) lengths + (n_coords,) degrees cross the
    link instead of the full uint8 degree volume."""
    lengths, degree = _branch_geometry_kernel(skel, spacing, num_labels)
    at = tuple(coords[:, d] for d in range(coords.shape[1]))
    return lengths, degree[at]


def branch_geometry(skel: np.ndarray, spacing, coords: np.ndarray = None,
                    skel_dev=None) -> Tuple[np.ndarray, np.ndarray]:
    """Host driver. skel: int label volume (skeleton voxels carry branch
    labels). Returns (lengths[max_label+1] physical units, degree volume
    uint8 of same-label neighbour counts).

    ``coords``: optional (n, d) int voxel coordinates — when given, the
    degree is gathered at those coordinates ON DEVICE and the second
    return value is the (n,) gathered vector instead of the full volume
    (a ~4 MB/frame pull at bench size).  ``skel_dev``: optional
    device-resident skeleton volume (the fused segmentation loop caches
    it per frame) — skips the volume upload entirely."""
    skel = np.asarray(skel)
    max_label = int(skel.max()) if skel.size else 0
    nb = _bucket(max_label + 1, 8)
    if skel_dev is not None:
        skel_in = skel_dev.astype(jnp.int32)
    else:
        # uint16 upload when labels fit (halves the volume's link bytes);
        # the kernel casts back to int32 on device
        host_dtype = np.uint16 if 0 <= max_label < (1 << 16) else np.int32
        skel_in = jnp.asarray(skel.astype(host_dtype)).astype(jnp.int32)
    sp = tuple(float(s) for s in spacing)
    if coords is not None:
        cb = _bucket(max(len(coords), 1), 128)
        cpad = np.zeros((cb, skel.ndim), np.int32)
        cpad[: len(coords)] = coords
        lengths, deg_at = _branch_geometry_at_kernel(
            skel_in, sp, nb, jnp.asarray(cpad))
        return (np.asarray(lengths)[: max_label + 1],
                np.asarray(deg_at)[: len(coords)])
    lengths, degree = _branch_geometry_kernel(skel_in, sp, nb)
    return np.asarray(lengths)[: max_label + 1], np.asarray(degree)


@partial(jax.jit, static_argnames=("num_segments",))
def _segment_nanstats_gather_kernel(values, idx, seg_ids, num_segments: int):
    """Like ``_segment_nanstats_kernel`` but over ``values[:, idx]``
    gathered ON DEVICE — the caller uploads the compact (S, C) value
    table + (N,) indices instead of the (S, N) pre-gathered matrix
    (N >> C for node membership pairs). ``idx`` rows < 0 are padding."""
    ok = idx >= 0
    gathered = jnp.where(ok[None, :], values[:, jnp.maximum(idx, 0)], jnp.nan)
    sid = jnp.where(ok, seg_ids, -1)
    return _segment_nanstats_kernel(gathered, sid, num_segments)


def segment_nanstats_gathered(values: np.ndarray, idx: np.ndarray,
                              seg_ids: np.ndarray, num_segments: int):
    """Per-segment nan statistics of ``values[:, idx]`` with the gather on
    device.  Same output contract as :func:`segment_nanstats`; small
    tables fall back to the host path (gather is cheap there)."""
    values = np.atleast_2d(np.asarray(values, np.float32))
    idx = np.asarray(idx, np.int64)
    seg_ids = np.asarray(seg_ids, np.int32)
    s, c = values.shape
    n = len(idx)
    if num_segments == 0:
        return {k: np.zeros((s, 0), np.float32) for k in STAT_KEYS}
    if n == 0:
        return {k: np.full((s, num_segments), np.nan, np.float32) for k in STAT_KEYS}
    if n < HOST_CUTOVER_N or num_segments <= 8:
        return group_stats_np(values[:, idx], seg_ids, num_segments)
    cb = _bucket(max(c, 1), 128)
    nb = _bucket(n, 128)
    gb = _bucket(num_segments, 8)
    v = np.full((s, cb), np.nan, np.float32)
    v[:, :c] = values
    ix = np.full((nb,), -1, np.int64)
    ix[:n] = idx
    ids = np.full((nb,), -1, np.int32)
    ids[:n] = seg_ids
    out = np.asarray(_segment_nanstats_gather_kernel(
        jnp.asarray(v), jnp.asarray(ix, jnp.int32), jnp.asarray(ids), gb))
    return {k: out[i][:, :num_segments] for i, k in enumerate(STAT_KEYS)}
