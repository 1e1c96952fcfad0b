"""Euclidean distance transforms via jump flooding (JFA).

The reference uses ``scipy.ndimage.distance_transform_edt`` twice:
* Markers: EDT of the object mask in pixel units, clamped
  (``mocap_marking.py:419-448``)
* Network: per-object nearest-*seed* indices with anisotropic sampling to
  propagate branch labels to whole objects (``networking.py:485-577``)

``distance_transform`` (the Markers consumer — feeds the distance
artifact, LoG validity masking and, downstream, hierarchy node widths)
is EXACT: squared EDT factorises into per-axis 1-D min-plus transforms
(Felzenszwalb & Huttenlocher 2012) evaluated as a windowed dense
sweep, which is both exact and TPU-friendly (pure shifted-add/min VPU
streaming, no data-dependent envelope stack).

``nearest_seed`` (argmin-carry: *which* seed, not just how far) uses
jump flooding: O(log n) dense passes, each shifting the best-seed
buffers by ±step along every axis combination and keeping the closer
candidate under the anisotropic metric.  We run the classic JFA+1
variant (an extra step-1 pass); errors are vanishingly rare and its
only consumer is branch-label propagation where ties break arbitrarily
(``stages/networking.py:128``) — quantified by the adversarial property
tests in ``tests/test_edt.py``.

The per-object constraint (a voxel may only adopt seeds belonging to its
own instance label) is enforced by carrying the seed's object id and
rejecting candidates with a different id — this reproduces the
reference's per-object-crop EDT semantics in one dense pass over the
whole frame instead of a Python loop over objects.
"""
from __future__ import annotations

import itertools
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _offsets(ndim: int):
    return [o for o in itertools.product((-1, 0, 1), repeat=ndim) if any(v != 0 for v in o)]


def _roll_state(state: jnp.ndarray, off, step) -> jnp.ndarray:
    """Roll the (C, *vol) state so position v reads from v + off*step.

    ``step`` may be traced (jnp.roll handles dynamic shifts); wrapped
    values are invalidated by the caller via a source-bounds mask.
    """
    shifts = [-o * step for o in off if True]
    axes = list(range(1, state.ndim))
    return jnp.roll(state, shift=tuple(shifts), axis=tuple(axes))


def _coords(shape) -> jnp.ndarray:
    return jnp.stack(
        [lax.broadcasted_iota(jnp.int32, shape, d) for d in range(len(shape))]
    )


def _dist_sq(coords, seed_coords, sampling):
    d = jnp.zeros(coords.shape[1:], jnp.float32)
    for axis in range(coords.shape[0]):
        diff = (coords[axis] - seed_coords[axis]).astype(jnp.float32) * float(sampling[axis])
        d = d + diff * diff
    return d


@partial(jax.jit, static_argnames=("sampling", "max_radius_px"))
def nearest_seed(
    seed_labels: jnp.ndarray,
    obj_labels: Optional[jnp.ndarray] = None,
    sampling: Tuple[float, ...] = None,
    max_radius_px: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-voxel nearest seed via JFA+1.

    seed_labels : int volume, >0 at seed voxels (the value is propagated).
    obj_labels  : optional int volume; a voxel only accepts seeds whose
                  object id (obj_labels at the seed) matches its own.
    sampling    : physical voxel size per axis (anisotropic metric).
    max_radius_px : optional search radius bound in voxels — when the
                  caller clamps distances anyway (Markers clamps at
                  2*max_radius_px, ``mocap_marking.py:444-448``) the jump
                  schedule only needs to cover that radius, halving the
                  number of dense passes.

    Returns (labels, distances): the nearest seed's value (0 where no
    reachable seed) and the physical distance to it (+inf where none).
    """
    shape = seed_labels.shape
    ndim = seed_labels.ndim
    if sampling is None:
        sampling = (1.0,) * ndim
    offsets = _offsets(ndim)
    reach = max(shape)
    if max_radius_px is not None:
        reach = min(reach, int(max_radius_px) + 1)
    n_steps = max(1, int(math.ceil(math.log2(max(reach, 2)))))
    steps = [1 << (n_steps - 1 - i) for i in range(n_steps)] + [1]

    coords = _coords(shape)
    # the state carries only the nearest seed's FLAT index (+ its object
    # id when constrained): 1-2 int32 channels instead of the naive
    # ndim+2, so each of the ~26*log(n) rolled copies moves 2.5-5x fewer
    # HBM bytes; seed coords are unflattened on the fly (mulhi/shift
    # div-by-constant on the VPU is far cheaper than the saved traffic)
    strides = [1] * ndim
    for ax in range(ndim - 2, -1, -1):
        strides[ax] = strides[ax + 1] * shape[ax + 1]

    flat_idx = jnp.zeros(shape, jnp.int32)
    for ax in range(ndim):
        flat_idx = flat_idx + coords[ax] * jnp.int32(strides[ax])

    def seed_dist(idx):
        """Squared physical distance from each voxel to the seed at flat
        index ``idx`` (+inf where idx < 0)."""
        d = jnp.zeros(shape, jnp.float32)
        rem = idx
        for ax in range(ndim):
            if ax < ndim - 1:
                q = rem // jnp.int32(strides[ax])
                rem = rem - q * jnp.int32(strides[ax])
            else:
                q = rem
            diff = (coords[ax] - q).astype(jnp.float32) * float(sampling[ax])
            d = d + diff * diff
        return jnp.where(idx >= 0, d, jnp.inf)

    is_seed = seed_labels > 0
    idx0 = jnp.where(is_seed, flat_idx, -1)
    has_obj = obj_labels is not None
    if has_obj:
        my_obj = obj_labels.astype(jnp.int32)
        state = jnp.stack([idx0, jnp.where(is_seed, my_obj, -1)])
    else:
        state = idx0[None]

    steps_arr = jnp.asarray(steps, jnp.int32)

    def one_step(i, state):
        step = steps_arr[i]
        cur_d = seed_dist(state[0])
        for off in offsets:
            cand = _roll_state(state, off, step)
            # source voxel v + off*step must be in-bounds (reject wraps)
            src_ok = jnp.ones(shape, bool)
            for axis, o in enumerate(off):
                if o != 0:
                    src = coords[axis] + o * step
                    src_ok = src_ok & (src >= 0) & (src < shape[axis])
            cand_valid = src_ok & (cand[0] >= 0)
            if has_obj:
                cand_valid = cand_valid & (cand[1] == my_obj)
            cand_d = jnp.where(cand_valid, seed_dist(cand[0]), jnp.inf)
            take = cand_d < cur_d
            state = jnp.where(take[None], cand, state)
            cur_d = jnp.where(take, cand_d, cur_d)
        return state

    state = lax.fori_loop(0, len(steps), one_step, state)

    final_idx = state[0]
    valid = final_idx >= 0
    labels = jnp.where(
        valid, seed_labels.reshape(-1)[jnp.maximum(final_idx, 0)], 0)
    dist = jnp.sqrt(seed_dist(final_idx))
    return labels, dist


# above this window the unrolled slice chain would bloat the program;
# fall back to a fori_loop (CPU-tested correctness path — production
# callers always pass a small clamp window)
_UNROLL_MAX = 128


def _minplus_axis(f_sq: jnp.ndarray, axis: int, radius: int, s: float) -> jnp.ndarray:
    """Windowed exact 1-D min-plus (squared-distance) transform along ``axis``.

    out[i] = min_{|k| <= radius} f_sq[i+k] + (k*s)^2, with out-of-bounds
    f_sq treated as +inf (the array border is not background, matching
    scipy.ndimage.distance_transform_edt).  This is the naive O(n*radius)
    evaluation of the Felzenszwalb/Huttenlocher lower envelope — on TPU
    the data-dependent envelope stack is hostile (sequential, dynamic),
    while a statically-unrolled chain of shifted adds fuses into a few
    VPU passes.  (A fori_loop with lax.dynamic_slice measured ~160 ms
    PER ITERATION on the tunnelled v5e — traced-start slices along
    non-minor axes compile to slow DMA patterns; static slices are the
    whole trick here.)
    """
    n = f_sq.shape[axis]
    pad = [(0, 0)] * f_sq.ndim
    pad[axis] = (radius, radius)
    fp = jnp.pad(f_sq, pad, constant_values=jnp.inf)

    if 2 * radius + 1 <= _UNROLL_MAX:
        out = None
        for k in range(2 * radius + 1):
            shifted = lax.slice_in_dim(fp, k, k + n, axis=axis)
            cand = shifted + jnp.float32(((k - radius) * s) ** 2)
            out = cand if out is None else jnp.minimum(out, cand)
        return out

    def body(k, out):
        shifted = lax.dynamic_slice_in_dim(fp, k, n, axis)
        d = ((k - radius).astype(jnp.float32) * jnp.float32(s)) ** 2
        return jnp.minimum(out, shifted + d)

    return lax.fori_loop(0, 2 * radius + 1, body,
                         jnp.full(f_sq.shape, jnp.inf, jnp.float32))


@partial(jax.jit, static_argnames=("sampling", "max_radius_px"))
def distance_transform(mask: jnp.ndarray, sampling: Tuple[float, ...] = None,
                       max_radius_px: Optional[int] = None) -> jnp.ndarray:
    """Distance from each True voxel to the nearest False voxel
    (scipy.ndimage.distance_transform_edt semantics), via an EXACT
    separable min-plus transform (squared EDT factorises per axis:
    Felzenszwalb & Huttenlocher 2012, evaluated as windowed dense
    min-plus — see ``_minplus_axis``).

    ``max_radius_px`` bounds the per-axis search window.  Within the
    bound the result is *exact* (bit-identical to scipy up to f32
    rounding): any voxel whose true distance is <= max_radius_px *
    min(sampling) has per-axis pixel offsets to its nearest background
    voxel of at most max_radius_px, so the windowed min-plus finds it;
    beyond the bound every surviving candidate is a real background
    voxel so the result only ever *over*-estimates — safe for callers
    that clamp at <= the bound (Markers clamps at 2*max_radius_px with
    window 2*max_radius_px+1, ``stages/mocap_marking.py:83-85``;
    reference consumer ``mocap_marking.py:419-448``).  Unbounded calls
    use the full per-axis extent and are exact everywhere.
    """
    ndim = mask.ndim
    if sampling is None:
        sampling = (1.0,) * ndim
    f = jnp.where(mask, jnp.inf, 0.0).astype(jnp.float32)
    for axis in range(ndim):
        r = mask.shape[axis] - 1
        if max_radius_px is not None:
            r = min(r, int(max_radius_px))
        f = _minplus_axis(f, axis, r, float(sampling[axis]))
    dist = jnp.sqrt(f)
    dist = jnp.nan_to_num(dist, posinf=float(max(mask.shape)))
    return jnp.where(mask, dist, 0.0)
