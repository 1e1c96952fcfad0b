"""Pallas TPU kernel: tiled brute-force nearest-neighbour argmin.

The voxel reassigner matches millions of flow-predicted centroids to the
nearest real voxel every frame pair (``voxel_reassignment.py:326-393``
implements the same brute force on GPU).  The distance computation is a
matmul in disguise::

    |q - r|^2 = |q|^2 + |r|^2 - 2 q . r

so each (TQ, TM) tile is one MXU contraction; the kernel keeps a running
(min-distance, argmin-index) accumulator in the output block across the
M-tile grid dimension and never materialises the (Q, M) distance matrix
to HBM — XLA's fallback writes each tile out and reduces it separately.

Layout notes: coordinate arrays are padded (Q, 8) / (M, 8) so the
contraction K-dim is sublane-aligned; M tiles are multiples of 128
(lane width); query padding rows get +inf distance, reference padding
rows get far-away coordinates so they never win the argmin.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAR = 1e15


def _nn_kernel(q_ref, r_ref, dist_ref, idx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dist_ref[:] = jnp.full_like(dist_ref, jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    q = q_ref[:]            # (TQ, 8)
    r = r_ref[:]            # (TM, 8)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)          # (TQ, 1)
    r2 = jnp.sum(r * r, axis=1, keepdims=True).T        # (1, TM)
    cross = jnp.dot(q, r.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # MXU, full f32
    d2 = q2 + r2 - 2.0 * cross                           # (TQ, TM)

    tm = r.shape[0]
    local_idx = jnp.argmin(d2, axis=1)                   # (TQ,)
    local_min = jnp.min(d2, axis=1)
    global_idx = (local_idx + j * tm).astype(jnp.int32)

    cur = dist_ref[:, 0]
    better = local_min < cur
    dist_ref[:, 0] = jnp.where(better, local_min, cur)
    idx_ref[:, 0] = jnp.where(better, global_idx, idx_ref[:, 0])


@partial(jax.jit, static_argnames=("tq", "tm"))
def nn_argmin_pallas(queries: jnp.ndarray, refs: jnp.ndarray,
                     tq: int = 512, tm: int = 2048):
    """(Q, d<=8) queries vs (M, d) refs -> (min_distance, argmin) per query.

    Inputs must already be padded: Q % tq == 0, M % tm == 0, second dim 8,
    padding reference rows at _FAR coordinates.  Returns squared-distance
    minima (sqrt applied by the caller) as (Q,) arrays.
    """
    q_pad, m_pad = queries.shape[0], refs.shape[0]
    grid = (q_pad // tq, m_pad // tm)
    dist, idx = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, 1), jnp.int32),
        ),
    )(queries, refs)
    return dist[:, 0], idx[:, 0]


@jax.jit
def nn_argmin_xla(queries: jnp.ndarray, refs: jnp.ndarray):
    """Plain-XLA fallback with the same MXU dot-trick formulation
    (used on CPU and as a cross-check for the Pallas kernel)."""
    q2 = jnp.sum(queries * queries, axis=1, keepdims=True)
    r2 = jnp.sum(refs * refs, axis=1, keepdims=True).T
    d2 = q2 + r2 - 2.0 * jnp.dot(queries, refs.T, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
    return jnp.min(d2, axis=1), jnp.argmin(d2, axis=1).astype(jnp.int32)


def _pad_rows(arr: np.ndarray, multiple: int, fill: float) -> np.ndarray:
    n = arr.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr
    pad = np.full((target - n, arr.shape[1]), fill, arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def nearest_neighbors(
    queries: np.ndarray, refs: np.ndarray,
    tq: int = 512, tm: int = 2048, m_chunk: int = 1 << 18,
):
    """Host driver: nearest reference for every query (physical coords).

    Pads to tile multiples and an 8-wide coordinate dim, runs the Pallas
    kernel on TPU (XLA fallback elsewhere), streams reference chunks when
    M is very large.  Returns (distances, indices) numpy arrays.
    """
    q_n, d = queries.shape
    m_n = refs.shape[0]
    if q_n == 0 or m_n == 0:
        return np.zeros((0,), np.float32), np.zeros((0,), np.int64)

    def pad8(a):
        out = np.zeros((a.shape[0], 8), np.float32)
        out[:, :d] = a
        return out

    use_pallas = jax.devices()[0].platform == "tpu"
    q_padded = _pad_rows(pad8(np.asarray(queries, np.float32)), tq, 0.0)

    best_d = np.full((q_padded.shape[0],), np.inf, np.float32)
    best_i = np.zeros((q_padded.shape[0],), np.int64)
    q_dev = jnp.asarray(q_padded)

    for start in range(0, m_n, m_chunk):
        end = min(start + m_chunk, m_n)
        r_padded = _pad_rows(pad8(np.asarray(refs[start:end], np.float32)), tm, _FAR)
        if use_pallas:
            dist, idx = nn_argmin_pallas(q_dev, jnp.asarray(r_padded), tq=tq, tm=tm)
        else:
            dist, idx = nn_argmin_xla(q_dev, jnp.asarray(r_padded))
        dist = np.asarray(dist)
        idx = np.asarray(idx).astype(np.int64) + start
        better = dist < best_d
        best_d = np.where(better, dist, best_d)
        best_i = np.where(better, idx, best_i)

    best_d = np.sqrt(np.maximum(best_d[:q_n], 0.0))
    best_i = np.clip(best_i[:q_n], 0, m_n - 1)
    return best_d, best_i
