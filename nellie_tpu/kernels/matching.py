"""Marker matching: masked pairwise costs + mutual argmin, tiled for scale.

Replaces both of the reference's matching paths — the dense
(N_post, N_pre, F) z-scored cost tensor (``hu_tracking.py:841-944``) and
the cKDTree-gated sparse streaming path (``hu_tracking.py:947-1094``) —
with one two-phase tiled computation that is *exactly* the dense
semantics at any scale:

  phase A: accumulate masked sums / sums-of-squares of every feature
           difference over distance-gated pairs (row tiles)
  phase B: re-walk the tiles, z-score each feature with the global
           moments, cost = z_dist + mean_f(z_stats) + mean_f(z_hu),
           track row minima and column minima

Features never materialise beyond an (tile, N_pre) matrix per feature,
so HBM stays bounded; all matrices are MXU/VPU-friendly dense ops.
Padding validity is carried in boolean masks (TPU-static shapes).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

COST_CUTOFF = 1.0


def _pair_mask_and_dist(coords_post, coords_pre, valid_post, valid_pre, max_distance):
    diff = coords_post[:, None, :] - coords_pre[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=2))
    mask = (dist < max_distance) & valid_post[:, None] & valid_pre[None, :]
    return dist / max_distance, mask


@jax.jit
def pair_stats(coords_post, coords_pre, feats_post, feats_pre,
               valid_post, valid_pre, max_distance):
    """Masked sums for feature-difference z-scoring.

    feats_*: (N, F) where feature 0 slot is unused for dist (added here).
    Returns (count, sum_f, sumsq_f) with F+1 entries (dist first).
    """
    dist_n, mask = _pair_mask_and_dist(coords_post, coords_pre, valid_post, valid_pre, max_distance)
    count = jnp.sum(mask)
    maskf = mask.astype(jnp.float32)
    sums = [jnp.sum(dist_n * maskf)]
    sumsqs = [jnp.sum(dist_n * dist_n * maskf)]
    n_feat = feats_post.shape[1]
    for f in range(n_feat):
        d = jnp.abs(feats_post[:, f][:, None] - feats_pre[:, f][None, :])
        sums.append(jnp.sum(d * maskf))
        sumsqs.append(jnp.sum(d * d * maskf))
    return count, jnp.stack(sums), jnp.stack(sumsqs)


@partial(jax.jit, static_argnames=("n_stats",))
def pair_costs(coords_post, coords_pre, feats_post, feats_pre,
               valid_post, valid_pre, max_distance,
               mean, std, n_stats):
    """Cost matrix mins for one row tile.

    feats layout: [stats (n_stats), hu (rest)].  mean/std: (1+F,) with the
    distance feature first.  Returns (row_min_val, row_min_idx,
    col_min_val, col_min_idx) for this tile.
    """
    dist_n, mask = _pair_mask_and_dist(coords_post, coords_pre, valid_post, valid_pre, max_distance)
    n_feat = feats_post.shape[1]
    n_hu = n_feat - n_stats

    cost = (dist_n - mean[0]) / std[0]
    for f in range(n_feat):
        d = jnp.abs(feats_post[:, f][:, None] - feats_pre[:, f][None, :])
        z = (d - mean[1 + f]) / std[1 + f]
        denom = n_stats if f < n_stats else n_hu
        cost = cost + z / denom
    cost = jnp.where(mask, cost, jnp.inf)

    row_min_idx = jnp.argmin(cost, axis=1)
    row_min_val = jnp.min(cost, axis=1)
    col_min_idx = jnp.argmin(cost, axis=0)
    col_min_val = jnp.min(cost, axis=0)
    return row_min_val, row_min_idx, col_min_val, col_min_idx


@jax.jit
def _pair_stats_packed(coords_post, coords_pre, feats_post, feats_pre,
                       valid_post, valid_pre, max_distance):
    """pair_stats with the three outputs packed into ONE f32 vector so a
    single device->host pull carries them (the tunnelled link costs
    ~20 ms per pull).  The integer count rides as a bitcast — exact for
    any count, unlike a float cast."""
    count, sums, sumsqs = pair_stats(coords_post, coords_pre, feats_post,
                                     feats_pre, valid_post, valid_pre,
                                     max_distance)
    cnt_bits = jax.lax.bitcast_convert_type(
        count.astype(jnp.int32), jnp.float32)
    return jnp.concatenate([cnt_bits[None], sums, sumsqs])


@partial(jax.jit, static_argnames=("n_stats",))
def _pair_costs_packed(coords_post, coords_pre, feats_post, feats_pre,
                       valid_post, valid_pre, max_distance, mean, std,
                       n_stats):
    """pair_costs with [row_min_val, row_min_idx, col_min_val,
    col_min_idx] packed into one f32 vector (indices bitcast, exact)."""
    rmv, rmi, cmv, cmi = pair_costs(coords_post, coords_pre, feats_post,
                                    feats_pre, valid_post, valid_pre,
                                    max_distance, mean, std, n_stats)
    to_bits = lambda a: jax.lax.bitcast_convert_type(  # noqa: E731
        a.astype(jnp.int32), jnp.float32)
    return jnp.concatenate([rmv, to_bits(rmi), cmv, to_bits(cmi)])


def _select_matches(row_min_val, row_min_idx, col_min_val, col_min_idx,
                    n_post, n_pre):
    """Union-of-candidates selection under the cost cutoff (the
    reference's semantics, ``hu_tracking.py:893-944``)."""
    row_matches, col_matches, costs = [], [], []
    for i in range(n_post):
        if row_min_idx[i] >= 0 and row_min_val[i] <= COST_CUTOFF and np.isfinite(row_min_val[i]):
            row_matches.append(int(i))
            col_matches.append(int(row_min_idx[i]))
            costs.append(float(row_min_val[i]))
    for j in range(n_pre):
        if col_min_idx[j] >= 0 and col_min_val[j] <= COST_CUTOFF and np.isfinite(col_min_val[j]):
            row_matches.append(int(col_min_idx[j]))
            col_matches.append(int(j))
            costs.append(float(col_min_val[j]))
    return row_matches, col_matches, costs


def match_frames_device(
    coords_post_dev, feats_post_dev, valid_post_dev, n_post: int,
    coords_pre_dev, feats_pre_dev, valid_pre_dev, n_pre: int,
    max_distance: float, n_stats: int,
) -> Tuple[list, list, list]:
    """Single-tile matching over DEVICE-resident padded features.

    Numerically identical to :func:`match_frames` on one tile (same
    kernels, same host-f64 mean/std between phases), but the padded
    feature arrays never leave HBM and each phase costs exactly one
    device->host pull — 2 round trips per frame pair instead of ~8.
    """
    if n_post == 0 or n_pre == 0:
        return [], [], []
    nb_post = coords_post_dev.shape[0]
    nb_pre = coords_pre_dev.shape[0]
    n_feat = feats_post_dev.shape[1]

    packed = np.asarray(_pair_stats_packed(
        coords_post_dev, coords_pre_dev, feats_post_dev, feats_pre_dev,
        valid_post_dev, valid_pre_dev, jnp.float32(max_distance)))
    count = int(packed[:1].view(np.int32)[0])
    if count == 0:
        return [], [], []
    sums = packed[1:2 + n_feat].astype(np.float64)
    sumsqs = packed[2 + n_feat:].astype(np.float64)
    mean = sums / count
    var = np.maximum(sumsqs / count - mean**2, 0.0)
    std = np.sqrt(var) + 1e-8

    packed2 = np.asarray(_pair_costs_packed(
        coords_post_dev, coords_pre_dev, feats_post_dev, feats_pre_dev,
        valid_post_dev, valid_pre_dev, jnp.float32(max_distance),
        jnp.asarray(mean, jnp.float32), jnp.asarray(std, jnp.float32),
        n_stats))
    row_min_val = packed2[:nb_post][:n_post]
    row_min_idx = packed2[nb_post:2 * nb_post].view(np.int32)[:n_post]
    col_min_val = packed2[2 * nb_post:2 * nb_post + nb_pre][:n_pre]
    col_min_idx = packed2[2 * nb_post + nb_pre:].view(np.int32)[:n_pre]
    return _select_matches(row_min_val, row_min_idx, col_min_val,
                           col_min_idx, n_post, n_pre)


def _pad_to(arr: np.ndarray, n: int, fill=0):
    if arr.shape[0] == n:
        return arr
    pad = np.full((n - arr.shape[0],) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def _bucket(n: int, minimum: int = 128) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def match_frames(
    coords_post: np.ndarray, coords_pre: np.ndarray,
    stats_post: np.ndarray, stats_pre: np.ndarray,
    hu_post: np.ndarray, hu_pre: np.ndarray,
    max_distance: float,
    tile_rows: int = 8192,
) -> Tuple[list, list, list]:
    """Mutual-argmin matching under a cost cutoff (host driver).

    Returns (row_matches, col_matches, costs) with the reference's
    union-of-candidates semantics (``hu_tracking.py:893-944``): every
    row whose best column is under the cutoff, plus every column whose
    best row is under the cutoff (duplicates preserved).
    """
    n_post, n_pre = coords_post.shape[0], coords_pre.shape[0]
    if n_post == 0 or n_pre == 0:
        return [], [], []
    n_stats = stats_post.shape[1]
    feats_post = np.concatenate([stats_post, hu_post], axis=1).astype(np.float32)
    feats_pre = np.concatenate([stats_pre, hu_pre], axis=1).astype(np.float32)

    npre_b = _bucket(n_pre)
    coords_pre_p = jnp.asarray(_pad_to(coords_pre.astype(np.float32), npre_b))
    feats_pre_p = jnp.asarray(_pad_to(feats_pre, npre_b))
    valid_pre = jnp.asarray(_pad_to(np.ones(n_pre, bool), npre_b, False))

    tiles = []
    for start in range(0, n_post, tile_rows):
        end = min(start + tile_rows, n_post)
        nb = _bucket(end - start)
        tiles.append((
            start, end,
            jnp.asarray(_pad_to(coords_post[start:end].astype(np.float32), nb)),
            jnp.asarray(_pad_to(feats_post[start:end], nb)),
            jnp.asarray(_pad_to(np.ones(end - start, bool), nb, False)),
        ))

    # phase A: global masked moments of each feature difference
    count = 0.0
    sums = None
    sumsqs = None
    for start, end, c, f, v in tiles:
        cnt, s, ss = pair_stats(c, coords_pre_p, f, feats_pre_p, v, valid_pre,
                                jnp.float32(max_distance))
        count += float(cnt)
        sums = np.asarray(s, np.float64) if sums is None else sums + np.asarray(s, np.float64)
        sumsqs = np.asarray(ss, np.float64) if sumsqs is None else sumsqs + np.asarray(ss, np.float64)
    if count == 0:
        return [], [], []
    mean = sums / count
    var = np.maximum(sumsqs / count - mean**2, 0.0)
    std = np.sqrt(var) + 1e-8

    # phase B: tile costs, reduce row/col minima
    row_min_val = np.full(n_post, np.inf, np.float32)
    row_min_idx = np.full(n_post, -1, np.int64)
    col_min_val = np.full(n_pre, np.inf, np.float32)
    col_min_idx = np.full(n_pre, -1, np.int64)
    mean_j = jnp.asarray(mean, jnp.float32)
    std_j = jnp.asarray(std, jnp.float32)
    for start, end, c, f, v in tiles:
        rmv, rmi, cmv, cmi = pair_costs(
            c, coords_pre_p, f, feats_pre_p, v, valid_pre,
            jnp.float32(max_distance), mean_j, std_j, n_stats,
        )
        n_rows = end - start
        row_min_val[start:end] = np.asarray(rmv)[:n_rows]
        row_min_idx[start:end] = np.asarray(rmi)[:n_rows]
        cmv_np = np.asarray(cmv)[:n_pre]
        cmi_np = np.asarray(cmi)[:n_pre]
        better = cmv_np < col_min_val
        col_min_val = np.where(better, cmv_np, col_min_val)
        # translate tile-local row index to global
        col_min_idx = np.where(better, cmi_np + start, col_min_idx)

    return _select_matches(row_min_val, row_min_idx, col_min_val,
                           col_min_idx, n_post, n_pre)
