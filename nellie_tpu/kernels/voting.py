"""On-device weighted label voting for voxel reassignment.

The reference aggregates per-(target-voxel, source-label) weights with a
host lexsort + ``np.add.reduceat`` and picks the best label per target
with a second lexsort (``voxel_reassignment.py:429-471``).  At
lightsheet scale those host sorts over 1e6-1e7 candidate rows are the
stage's serial floor.  Here the same semantics run as ONE jitted XLA
program: a stable multi-key ``lax.sort`` groups candidates by
(target, label) with the best candidate first, a segment-sum accumulates
pair weights, and a second stable sort by (target, -pair_weight) picks
each target's winning label — the same tie-breaking RULES as the host
path (stable sorts; equal pair sums fall back to ascending label
order).  One caveat: weight sums accumulate in float32 here vs float64
on the host path, so winners whose pair sums differ by less than f32
resolution can flip between the two implementations (the cutover in
voxel_reassignment.py is by candidate count; near-ties at that scale
are voting noise either way).

Counts are padded to power-of-two buckets so repeated frames reuse one
compiled program per bucket.  Flat target indices must fit int32
(volumes up to 2^31 voxels — the same bound as the CC layer's uint32
encoding); larger volumes fall back to the host path.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

_SENTINEL = np.iinfo(np.int32).max


def _bucket(n: int, minimum: int = 1024) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@partial(jax.jit, static_argnames=())
def _vote_kernel(target_flat, labels, weights, valid):
    """(N,) int32 targets, int32 labels, f32 weights, bool valid ->
    (is_winner, target, label, candidate index) row arrays."""
    n = target_flat.shape[0]
    cand_idx = jnp.arange(n, dtype=jnp.int32)

    tgt = jnp.where(valid, target_flat, _SENTINEL)
    lbl = jnp.where(valid, labels, _SENTINEL)
    neg_w = jnp.where(valid, -weights, jnp.inf)

    # group by (target, label), best-weight candidate first in each group
    tgt_s, lbl_s, negw_s, w_s, idx_s = jax.lax.sort(
        (tgt, lbl, neg_w, jnp.where(valid, weights, 0.0), cand_idx),
        num_keys=3, is_stable=True)

    first = jnp.ones((n,), bool).at[1:].set(
        (tgt_s[1:] != tgt_s[:-1]) | (lbl_s[1:] != lbl_s[:-1]))
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1
    pair_sums = jax.ops.segment_sum(w_s, seg_id, num_segments=n)
    row_pair_sum = pair_sums[seg_id]
    row_valid = tgt_s != _SENTINEL

    # second stable sort: per target, the pair with the largest weight sum
    # first (ties -> ascending label via the preserved first-sort order)
    lead = first & row_valid
    tgt_key = jnp.where(lead, tgt_s, _SENTINEL)
    neg_sum = jnp.where(lead, -row_pair_sum, jnp.inf)
    tgt2, _negsum2, lbl2, idx2 = jax.lax.sort(
        (tgt_key, neg_sum, lbl_s, idx_s), num_keys=2, is_stable=True)

    win = jnp.ones((n,), bool).at[1:].set(tgt2[1:] != tgt2[:-1])
    win = win & (tgt2 != _SENTINEL)
    return win, tgt2, lbl2, idx2


def vote_targets(target_flat: np.ndarray, source_labels: np.ndarray,
                 distances: np.ndarray):
    """Best source label per target voxel by summed 1/(d+1e-6) weights.

    Returns (targets, labels, candidate_indices) — one row per distinct
    target, same ordering and tie-breaks as the host lexsort/reduceat
    path.  Caller guarantees ``target_flat < 2^31 - 1``.
    """
    n = len(target_flat)
    if n == 0:
        return (np.empty((0,), np.int64), np.empty((0,), source_labels.dtype),
                np.empty((0,), np.int64))
    weights = (1.0 / (np.asarray(distances, np.float64) + 1e-6)).astype(np.float32)
    nb = _bucket(n)
    tf = np.zeros((nb,), np.int32)
    tf[:n] = target_flat
    lb = np.zeros((nb,), np.int32)
    lb[:n] = source_labels
    w = np.zeros((nb,), np.float32)
    w[:n] = weights
    valid = np.zeros((nb,), bool)
    valid[:n] = True

    win, tgt, lbl, idx = (np.asarray(a) for a in _vote_kernel(
        jnp.asarray(tf), jnp.asarray(lb), jnp.asarray(w), jnp.asarray(valid)))
    sel = win
    return (tgt[sel].astype(np.int64), lbl[sel].astype(source_labels.dtype),
            idx[sel].astype(np.int64))
