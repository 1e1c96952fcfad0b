"""Connected-component labelling and hole filling as XLA fixpoints.

The reference uses ``scipy.ndimage.label`` / ``cupyx`` with a full 3³
structuring element (``labelling.py:489,507``) and host union-find for
cross-chunk merges (``labelling.py:221-287``).  On TPU, component labels
are propagated as a fixpoint of

  segmented min-scans along every axis (lax.associative_scan — a label
  crosses a whole straight run in one log-depth pass)
  + a 26/8-neighbour min stencil (hops across bends and diagonals)

with NO gathers or scatters in the loop — TPUs execute those poorly
(an earlier FastSV pointer-jumping variant was 10x slower).  Because
each component converges to its minimum linear (raster-order) index,
ranking roots by cumsum reproduces scipy's label numbering *exactly*.

``fill_holes`` runs the same machinery on the background with
face-connectivity and keeps only components that touch the volume
border (scipy ``binary_fill_holes`` semantics).
"""
from __future__ import annotations

import itertools
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nellie_tpu.kernels.filters import shift_fill

# stencil hops per fixpoint round in union_find_roots (see body comment);
# 48 is the measured knee on tube geometry, with no small-mask downside
STENCIL_HOPS_PER_ROUND = 48

# On TPU, volumes whose longest axis is at most this run the fixpoints
# HOP-ONLY (64 hops/round, no segmented scans): measured at 64x256x256
# the six per-round associative scans cost ~11 ms each round yet leave
# the round count unchanged (5 rounds either way) — hop-only converges
# in 35.6 ms vs 91.6 ms with scans.  Scans still pay for themselves when
# a single straight run can exceed what a few hop rounds cover, so
# larger volumes keep them.  Convergence (and hence exactness) is
# schedule-independent: the while_loop exits only at the true fixpoint.
_HOP_ONLY_MAX_DIM = 512
_HOP_ONLY_HOPS = 64

# Above this many voxels the per-round hop chain runs as a fori_loop
# instead of a Python unroll: XLA holds every unrolled hop's temporaries
# live simultaneously (~80 full-volume buffers at 64 hops — 17.5 GB at a
# 384³ volume, measured OOM), while the rolled loop carries ONE buffer.
# Below it the unroll stays (marginally better fusion at frame sizes).
_UNROLL_HOPS_MAX_VOX = 1 << 23


def _hop_chain(stencil, x, hops: int):
    """``hops`` applications of ``stencil``, unrolled only when the
    volume is small enough that the unroll's live-buffer cost is noise."""
    if int(np.prod(x.shape)) <= _UNROLL_HOPS_MAX_VOX:
        for _ in range(hops):
            x = stencil(x)
        return x
    return lax.fori_loop(0, hops, lambda _, p: stencil(p), x)


def _stencil_hops() -> int:
    """Hops per scan round, by backend (read at trace time).

    On TPU the segmented scans dominate a round, so many cheap 1-voxel
    stencil hops per round pay for themselves by cutting scan rounds
    (18 -> 6 rounds, 2.1x, at 64x256x256).  On CPU/GPU scans are cheap
    relative to dozens of full-volume sweeps, so a single hop is right."""
    return STENCIL_HOPS_PER_ROUND if jax.default_backend() in ("tpu", "axon") else 1


def _hop_only(shape) -> bool:
    """Trace-time choice: drop the per-round scans entirely (see
    ``_HOP_ONLY_MAX_DIM``)."""
    return (jax.default_backend() in ("tpu", "axon")
            and max(shape) <= _HOP_ONLY_MAX_DIM)


def neighbor_offsets(ndim: int, connectivity: str = "full"):
    """Neighbour offsets: 'full' = 8/26-connectivity, 'faces' = 4/6."""
    if connectivity == "full":
        offs = [
            o for o in itertools.product((-1, 0, 1), repeat=ndim) if any(v != 0 for v in o)
        ]
    elif connectivity == "faces":
        offs = []
        for axis in range(ndim):
            for d in (-1, 1):
                o = [0] * ndim
                o[axis] = d
                offs.append(tuple(o))
    else:
        raise ValueError(connectivity)
    return tuple(offs)


def _shift_nd(x: jnp.ndarray, offsets, fill) -> jnp.ndarray:
    out = x
    for axis, o in enumerate(offsets):
        if o != 0:
            out = shift_fill(out, axis, o, fill)
    return out


def _neighbor_min(pv: jnp.ndarray, maskv: jnp.ndarray, offsets, sentinel) -> jnp.ndarray:
    m = jnp.where(maskv, pv, sentinel)
    for off in offsets:
        cand = _shift_nd(jnp.where(maskv, pv, sentinel), off, sentinel)
        m = jnp.minimum(m, cand)
    return jnp.where(maskv, m, sentinel)


def _segmented_min_scan(values: jnp.ndarray, maskv: jnp.ndarray, axis: int,
                        reverse: bool, sentinel) -> jnp.ndarray:
    """Min over the contiguous fg run ending at each position along ``axis``.

    Segmented-scan monoid: elements (reset, value); background voxels are
    segment boundaries.  One associative_scan = log-depth, pure VPU —
    this is what lets component labels cross an entire straight run in a
    single pass instead of one voxel per iteration.
    """
    reset = ~maskv
    vals = jnp.where(maskv, values, sentinel)

    def combine(a, b):
        ar, av = a
        br, bv = b
        return ar | br, jnp.where(br, bv, jnp.minimum(av, bv))

    _, out = lax.associative_scan(combine, (reset, vals), axis=axis, reverse=reverse)
    return jnp.where(maskv, out, sentinel)


def _encoded_scan_keys(shape, reset_u32, value_bits):
    """Per (axis, direction) scan keys for the single-array encoding, or
    None if ``value_bits + run-id bits`` overflows 32 for some axis.

    Encoding: ``enc = ((axis_len + 1 - run_id) << value_bits) | value``
    where run_id = inclusive cumsum of segment resets along the scan
    direction.  Earlier runs get strictly larger keys, so a plain
    min-scan of ``enc`` never leaks values across a background gap —
    the (reset, value) pair monoid collapses to ``jnp.minimum`` on one
    uint32 array (≈1.3x on the fixpoint).  Keys depend only on the
    mask, so they are computed once outside the while loop."""
    import math

    keys = {}
    for axis in range(len(shape)):
        if value_bits + math.ceil(math.log2(shape[axis] + 2)) > 32:
            return None
        for rev in (False, True):
            rid = lax.cumsum(reset_u32, axis=axis, reverse=rev)
            keys[(axis, rev)] = (jnp.uint32(shape[axis] + 1) - rid) << value_bits
    return keys


@partial(jax.jit, static_argnames=("connectivity",))
def union_find_roots(mask: jnp.ndarray, connectivity: str = "full") -> jnp.ndarray:
    """Per-voxel root (min linear index of its component), n for background.

    Fixpoint of {segmented min-scans along every axis (both directions)
    + neighbour-min}: the scans propagate the component minimum across
    whole axis-aligned runs per pass (log-depth associative_scan), the
    stencil hops it across bends/diagonals — no gathers or scatters,
    which TPUs execute poorly.  Converges in O(#bends) passes.

    When ``log2(n) + log2(max axis)`` fits 32 bits the scan runs on a
    single run-id-keyed uint32 array (see ``_encoded_scan_keys``);
    otherwise it falls back to the (reset, value) pair monoid.

    Returns a flat int32 array of length n (= mask.size).
    """
    import math

    shape = mask.shape
    n = int(np.prod(shape))
    offsets = neighbor_offsets(mask.ndim, connectivity)
    fg = mask

    value_bits = max(1, math.ceil(math.log2(n + 1)))
    keys = (None if _hop_only(shape) else
            _encoded_scan_keys(shape, (~fg).astype(jnp.uint32), value_bits))

    if keys is not None or _hop_only(shape):
        sentinel = jnp.uint32(n)
        vmask = jnp.uint32((1 << value_bits) - 1)
        lbl0 = jnp.where(fg, jnp.arange(n, dtype=jnp.uint32).reshape(shape), sentinel)

        def scan1(vals, axis, rev):
            out = lax.associative_scan(
                jnp.minimum, keys[(axis, rev)] | vals, axis=axis, reverse=rev)
            return jnp.where(fg, out & vmask, sentinel)
    else:
        sentinel = jnp.int32(n)
        lbl0 = jnp.where(fg, jnp.arange(n, dtype=jnp.int32).reshape(shape), sentinel)

        def scan1(vals, axis, rev):
            return _segmented_min_scan(vals, fg, axis, rev, sentinel)

    if connectivity == "full":
        # 26/8-neighbour min == 3³/3² box min, which is separable: 6/4
        # shifted mins instead of 26/8 offset shifts.  (One application
        # may route a value through a background corner, but the box min
        # is the min of *original* in-box values — exactly the
        # full-connectivity adjacency; re-masking between applications
        # keeps multi-hop propagation on foreground paths only.)
        def stencil(p):
            m = jnp.where(fg, p, sentinel)
            for axis in range(mask.ndim):
                m = jnp.minimum(m, jnp.minimum(shift_fill(m, axis, 1, sentinel),
                                               shift_fill(m, axis, -1, sentinel)))
            return jnp.where(fg, m, sentinel)
    else:
        def stencil(p):
            return _neighbor_min(p, fg, offsets, sentinel)

    hop_only = _hop_only(shape)
    hops = _HOP_ONLY_HOPS if hop_only else _stencil_hops()

    def body(state):
        lbl, _ = state
        new = lbl
        if not hop_only:
            for axis in range(mask.ndim):
                new = scan1(new, axis, False)
                new = scan1(new, axis, True)
        # several cheap 1-voxel stencil hops per (expensive) scan round:
        # hops cross bends/diagonals, so extra hops cut the number of
        # scan rounds needed (measured: 18 rounds @1 hop -> 6 @32 hops,
        # 0.235 -> 0.110 s at 64x256x256; harmless for blob-like masks)
        new = _hop_chain(stencil, new, hops)
        return new, jnp.any(new != lbl)

    lbl, _ = lax.while_loop(lambda s: s[1], body, (lbl0, jnp.bool_(True)))
    return lbl.reshape(-1).astype(jnp.int32)


def label_from_roots(roots_flat: jnp.ndarray, fg_flat: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """scipy-sequential labels from per-voxel roots, via two device sorts.

    The obvious finisher (``rank = cumsum(is_root); labels = rank[roots]``)
    is a full-volume random gather, which TPUs serialise — measured ~18 ms
    net / 17.5 GB of HBM traffic at 4.2 Mvox, the single largest byte
    source in the fused segment step.  Sorting by root instead groups each
    component contiguously, the component id is a cumsum over run starts,
    and a second sort by original index unsorts — sort + elementwise only,
    measured at tunnel-RTT noise on v5e (sort of 4.2M key+payload ≈ the
    cumsum+gather's *latency* with ~9x fewer bytes).

    Because every component's root is its minimum linear index, ranking
    sorted roots reproduces scipy's raster-order numbering exactly.
    """
    n = roots_flat.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(fg_flat, roots_flat, n)
    ks, inv = lax.sort((key, idx), num_keys=1)
    isfg_s = ks < n  # bg (key == n) sorts to the tail
    first = jnp.ones((n,), bool).at[1:].set(ks[1:] != ks[:-1]) & isfg_s
    comp = jnp.where(isfg_s, jnp.cumsum(first.astype(jnp.int32)), 0)
    _, labels = lax.sort((inv, comp), num_keys=1)
    return labels, jnp.sum(first.astype(jnp.int32))


@partial(jax.jit, static_argnames=("connectivity",))
def label(mask: jnp.ndarray, connectivity: str = "full") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Connected components with scipy-identical sequential numbering.

    Returns (labels int32 volume, num_components scalar).  Matches
    ``scipy.ndimage.label(mask, structure=ones((3,)*ndim))`` for
    connectivity='full' and the default cross structure for 'faces'.
    """
    roots = union_find_roots(mask, connectivity)
    labels, num = label_from_roots(roots, mask.reshape(-1))
    return labels.reshape(mask.shape), num


def _segmented_or_scan(reached: jnp.ndarray, maskv: jnp.ndarray, axis: int,
                       reverse: bool) -> jnp.ndarray:
    """Has any position in the contiguous ``maskv`` run ending here been
    reached?  Same segmented-scan structure as ``_segmented_min_scan``
    but over bools — half the bandwidth, no sentinel arithmetic."""
    reset = ~maskv

    def combine(a, b):
        ar, av = a
        br, bv = b
        return ar | br, jnp.where(br, bv, av | bv)

    _, out = lax.associative_scan(
        combine, (reset, reached & maskv), axis=axis, reverse=reverse)
    return out & maskv


@jax.jit
def fill_holes(mask: jnp.ndarray) -> jnp.ndarray:
    """Fill background regions not connected to the volume border
    (scipy.ndimage.binary_fill_holes with the default cross structure).

    Border-reachability flood over the background as a fixpoint of
    segmented OR-scans (a whole straight bg run floods in one log-depth
    pass) + face-neighbour OR — a pure boolean analogue of
    ``union_find_roots`` with no root ranking, scatter, or gather.
    Voxels never reached from the border are holes."""
    bg = ~mask
    ndim = mask.ndim

    border = jnp.zeros(mask.shape, dtype=bool)
    for axis in range(ndim):
        sl_lo = [slice(None)] * ndim
        sl_lo[axis] = slice(0, 1)
        sl_hi = [slice(None)] * ndim
        sl_hi[axis] = slice(-1, None)
        border = border.at[tuple(sl_lo)].set(True)
        border = border.at[tuple(sl_hi)].set(True)

    offsets = neighbor_offsets(ndim, "faces")
    hop_only = _hop_only(mask.shape)
    hops = _HOP_ONLY_HOPS if hop_only else _stencil_hops()

    def body(state):
        r, _ = state
        new = r
        if not hop_only:
            for axis in range(ndim):
                new = _segmented_or_scan(new, bg, axis, False)
                new = new | _segmented_or_scan(new, bg, axis, True)
        # multi-hop dilation between scan rounds (same schedule rationale
        # as union_find_roots).  Each hop must be SYNCHRONOUS — all six
        # shifts taken from the same bg-masked base — otherwise a value
        # shifted onto a foreground voxel by one offset gets re-shifted
        # by the next, i.e. reachability tunnels diagonally through
        # foreground corners, which face connectivity forbids.
        def _dilate(base):
            out = base
            for off in offsets:
                out = out | _shift_nd(base, off, False)
            return out & bg

        new = _hop_chain(_dilate, new, hops)
        return new, jnp.any(new != r)

    reached, _ = lax.while_loop(
        lambda s: s[1], body, (border & bg, jnp.bool_(True)))
    return ~reached


# Above this many bounded hops the full scan+stencil fixpoint is cheaper.
_SMALL_HOPS_MAX = 96


def _class_keep_sorted(vals_flat: jnp.ndarray, boundary_flat: jnp.ndarray,
                       fg_flat: jnp.ndarray, min_size: int) -> jnp.ndarray:
    """``keep = fg & (class size >= min_size  OR  class has a boundary
    member)`` — computed by sorting voxels by class value so each class
    is a contiguous run, then sizing/flagging runs with 1-D segmented
    scans, then unsorting.  Replaces a scatter-add + random gather pair
    (TPUs serialise both — measured ~65 ms each at 4.2 Mvox) and the
    earlier (2*hops+1)^ndim-tap stencil form (8.8 GB of HBM traffic at
    125 taps) with two sorts + four 1-D scans (~0.15 GB)."""
    n = vals_flat.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(fg_flat, vals_flat.astype(jnp.uint32), jnp.uint32(n))
    ks, bs, inv = lax.sort((key, boundary_flat, idx), num_keys=1)
    isfg_s = ks < jnp.uint32(n)
    first = jnp.ones((n,), bool).at[1:].set(ks[1:] != ks[:-1])
    last = jnp.ones((n,), bool).at[:-1].set(ks[1:] != ks[:-1])

    def seg_copy(reset, vals, reverse):
        # propagate the value at each run's reset position across the run
        def combine(a, b):
            ar, av = a
            br, bv = b
            return ar | br, jnp.where(br, bv, av)

        return lax.associative_scan(combine, (reset, vals), reverse=reverse)[1]

    pos = jnp.arange(n, dtype=jnp.int32)
    start = seg_copy(first, pos, False)
    end = seg_copy(last, pos, True)
    size = end - start + 1

    def seg_or(reset, vals, reverse):
        def combine(a, b):
            ar, av = a
            br, bv = b
            return ar | br, jnp.where(br, bv, av | bv)

        return lax.associative_scan(combine, (reset, vals), reverse=reverse)[1]

    has_b = seg_or(first, bs, False) | seg_or(last, bs, True)
    keep_s = isfg_s & ((size >= min_size) | has_b)
    _, keep = lax.sort((inv, keep_s), num_keys=1)
    return keep


@partial(jax.jit, static_argnames=("min_size", "connectivity"))
def remove_small_components(
    mask: jnp.ndarray, min_size: int, connectivity: str = "full"
) -> jnp.ndarray:
    """Drop components with fewer than ``min_size`` voxels
    (the reference's bincount area filter, ``labelling.py:495-501``).

    Exact bounded-hop fast path (full connectivity): a component with
    ``size < min_size`` has geodesic diameter <= ``min_size - 2``, so
    ``min_size - 2`` synchronous 26/8-neighbour min hops converge every
    small component to a single value class whose member count is its
    exact size.  Classes of *large* components may be unconverged
    fragments — but a fragment is a strict subset of a connected
    component, so some member has a foreground neighbour with a
    different value: a box-min != box-max test over the 3^ndim
    neighbourhood (any fg voxel in the box is 26/8-adjacent, i.e.
    same-component) flags exactly the unconverged classes, which are
    kept unconditionally.  Complete components (no differing neighbour
    anywhere) are filtered by their exact size.  The count + verdict
    lookup run sorted (``_class_keep_sorted``); the whole filter is
    ``min_size - 2`` hops + one separable box min/max + two sorts.
    """
    if min_size <= 1:
        return mask
    hops = max(min_size - 2, 0)
    shape = mask.shape
    if connectivity != "full" or hops > _SMALL_HOPS_MAX:
        roots = union_find_roots(mask, connectivity)
        fg = mask.reshape(-1)
        keep = fg & _class_keep_sorted(
            roots, jnp.zeros_like(fg), fg, min_size)
        return keep.reshape(shape)

    n = int(np.prod(shape))
    fg = mask
    sentinel = jnp.uint32(n)
    vals = jnp.where(fg, jnp.arange(n, dtype=jnp.uint32).reshape(shape), sentinel)

    def hop(p):
        # separable 3^ndim box min == 26/8-neighbour min (see the
        # union_find_roots stencil comment); re-masking keeps multi-hop
        # propagation on foreground paths only
        m = jnp.where(fg, p, sentinel)
        for axis in range(mask.ndim):
            m = jnp.minimum(m, jnp.minimum(shift_fill(m, axis, 1, sentinel),
                                           shift_fill(m, axis, -1, sentinel)))
        return jnp.where(fg, m, sentinel)

    vals = _hop_chain(hop, vals, hops)

    # box min/max of the fg-masked values WITHOUT re-masking between the
    # separable axis passes: the result at a fg voxel is the min/max over
    # all fg values in its 3^ndim box — every one of which is a
    # same-component neighbour — so min != max <=> an adjacent member
    # holds a different value <=> this class is an unconverged fragment.
    mn = jnp.where(fg, vals, sentinel)
    mx = jnp.where(fg, vals, jnp.uint32(0))
    for axis in range(mask.ndim):
        mn = jnp.minimum(mn, jnp.minimum(shift_fill(mn, axis, 1, sentinel),
                                         shift_fill(mn, axis, -1, sentinel)))
        mx = jnp.maximum(mx, jnp.maximum(shift_fill(mx, axis, 1, jnp.uint32(0)),
                                         shift_fill(mx, axis, -1, jnp.uint32(0))))
    boundary = fg & (mn != mx)

    keep = fg.reshape(-1) & _class_keep_sorted(
        vals.reshape(-1), boundary.reshape(-1), fg.reshape(-1), min_size)
    return keep.reshape(shape)
