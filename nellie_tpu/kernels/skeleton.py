"""Topology-preserving thinning (skeletonisation) as an XLA fixpoint.

Replaces ``skimage.morphology.skeletonize`` (used by the reference at
``networking.py:394-409``).  The reference's Lee-94 thinning deletes
simple points sequentially; here deletion runs as a parallel fixpoint:

* 3D: per iteration, sweep the 6 border directions (Lee-style
  subiterations: candidates fixed to the pass-start border layer so each
  sweep peels one layer per direction); within a pass, simplicity is
  re-checked as deletions land and conflict-free subsets commit in
  parallel (see ``skeletonize_3d``).  The simple-point test is the exact
  Bertrand–Malandain (26,6) characterisation, evaluated arithmetically
  (gather-free VPU label propagation, ``_deletable_arith``) or via the
  precomputed 8 MiB LUT (``nellie_tpu.kernels.simple_point``).
* 2D: Zhang–Suen two-subiteration thinning (designed parallel-safe).

Both are pure jitted functions: while_loop over dense masks, no
data-dependent shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from nellie_tpu.kernels.filters import shift_fill
from nellie_tpu.kernels.simple_point import OFFSETS_26, get_simple26_lut


def _shift3(x, off, fill):
    out = x
    for axis, o in enumerate(off):
        if o != 0:
            out = shift_fill(out, axis, o, fill)
    return out


def _pack26(fg: jnp.ndarray) -> jnp.ndarray:
    """Pack the 26 neighbour occupancies into an int32 code per voxel.

    Neighbour k occupied means voxel at position v + OFFSETS_26[k] is fg,
    which is fg shifted by +offset (shift semantics: take from v+off).
    """
    code = jnp.zeros(fg.shape, jnp.int32)
    for k, off in enumerate(OFFSETS_26):
        nb = _shift3(fg, off, False)
        code = code | (nb.astype(jnp.int32) << k)
    return code


def _deletable(fg: jnp.ndarray, lut: jnp.ndarray, where=None) -> jnp.ndarray:
    """LUT deletability, evaluated only at ``where`` voxels (indices are
    clamped to 0 elsewhere, which collapses most of the gather onto one
    cache line — gathers are the dominant cost of thinning on TPU)."""
    code = _pack26(fg)
    sel = fg if where is None else (fg & where)
    code = jnp.where(sel, code, 0)
    byte = lut[code >> 3]
    return ((byte >> (code & 7).astype(jnp.uint8)) & 1).astype(bool) & sel


def _deletable_arith(fg: jnp.ndarray, where=None) -> jnp.ndarray:
    """Gather-free simple-point test: the Bertrand–Malandain (26,6)
    characterisation evaluated *arithmetically* per voxel — label
    propagation over the static 26-cell / 18-cell neighbourhood graphs as
    pure elementwise VPU ops (min/or over shifted planes).  Same truth
    table as the 8 MiB LUT, but no gathers, which TPUs execute poorly.
    """
    from nellie_tpu.kernels.simple_point import (
        adjacency_26,
        adjacency_6_within_18,
        face_cells,
        n18_cells,
    )

    sel = fg if where is None else (fg & where)
    big = jnp.int8(127)

    # occupancy planes of the 26 neighbour cells
    occ = [_shift3(fg, off, False) for off in OFFSETS_26]

    # condition 1: one 26-connected component among occupied cells
    adj = adjacency_26()

    def prop1(state):
        lbl, _ = state
        new = []
        for k in range(26):
            m = lbl[k]
            for j in adj[k]:
                m = jnp.minimum(m, lbl[j])
            new.append(jnp.where(occ[k], m, big))
        changed = jnp.bool_(False)
        for k in range(26):
            changed = changed | jnp.any(new[k] != lbl[k])
        return new, changed

    lbl0 = [jnp.where(occ[k], jnp.int8(k), big) for k in range(26)]
    lbl, _ = lax.while_loop(lambda s: s[1], prop1, (lbl0, jnp.bool_(True)))
    n_comp = jnp.zeros(fg.shape, jnp.int8)
    n_fg = jnp.zeros(fg.shape, jnp.int8)
    for k in range(26):
        n_comp = n_comp + (occ[k] & (lbl[k] == k)).astype(jnp.int8)
        n_fg = n_fg + occ[k].astype(jnp.int8)
    cond1 = n_comp == 1

    # condition 2: one 6-connected bg component in N18 touching a face cell
    cells = n18_cells()
    adj6 = adjacency_6_within_18()
    faces = set(face_cells())
    bg = {c: ~occ[c] for c in cells}

    def prop2(state):
        lbl2, reach, _ = state
        new_lbl = []
        new_reach = []
        for i, c in enumerate(cells):
            m = lbl2[i]
            r = reach[i]
            for j in adj6[c]:
                ji = cells.index(j)
                m = jnp.minimum(m, lbl2[ji])
                r = r | reach[ji]
            new_lbl.append(jnp.where(bg[c], m, big))
            new_reach.append(r & bg[c])
        changed = jnp.bool_(False)
        for i in range(len(cells)):
            changed = changed | jnp.any(new_lbl[i] != lbl2[i]) | jnp.any(new_reach[i] != reach[i])
        return new_lbl, new_reach, changed

    lbl2_0 = [jnp.where(bg[c], jnp.int8(c), big) for c in cells]
    reach_0 = [bg[c] if c in faces else jnp.zeros(fg.shape, bool) for c in cells]
    lbl2, reach, _ = lax.while_loop(
        lambda s: s[2], prop2, (lbl2_0, reach_0, jnp.bool_(True)))
    n_comp2 = jnp.zeros(fg.shape, jnp.int8)
    for i, c in enumerate(cells):
        n_comp2 = n_comp2 + (bg[c] & (lbl2[i] == c) & reach[i]).astype(jnp.int8)
    cond2 = n_comp2 == 1

    return cond1 & cond2 & (n_fg > 1) & sel


def _neighborhood_masks():
    """Static bitmask tables for the packed simple-point test."""
    from nellie_tpu.kernels.simple_point import (
        adjacency_26,
        adjacency_6_within_18,
        face_cells,
        n18_cells,
    )

    adj26 = tuple(sum(1 << j for j in nbrs) for nbrs in adjacency_26())
    cells18 = tuple(n18_cells())
    adj6 = adjacency_6_within_18()
    adj6_masks = tuple((c, sum(1 << j for j in adj6[c])) for c in cells18)
    n18_mask = sum(1 << c for c in cells18)
    face_mask = sum(1 << c for c in face_cells())
    return adj26, adj6_masks, n18_mask, face_mask


_ADJ26_MASKS, _ADJ6_MASKS, _N18_MASK, _FACE_MASK = _neighborhood_masks()


def _flood_bits(occ: jnp.ndarray, start: jnp.ndarray, adj_masks) -> jnp.ndarray:
    """Per-voxel set flood over a static cell graph, all 26 cells packed in
    ONE int32 plane: reach grows by the union of adjacency masks of every
    reached bit (scalar constants), clipped to occupied cells, to fixpoint.
    """
    def step(state):
        reach, _ = state
        grow = reach
        for k, m in adj_masks:
            grow = grow | jnp.where((reach >> k) & 1 != 0, jnp.int32(m), 0)
        new = grow & occ
        return new, jnp.any(new != reach)

    reach, _ = lax.while_loop(lambda s: s[1], step, (start, jnp.bool_(True)))
    return reach


def _deletable_packed(fg: jnp.ndarray, where=None) -> jnp.ndarray:
    """Bertrand–Malandain (26,6) simple-point test on bit-packed
    neighbourhoods: each voxel's 26 occupancies live in one int32, and
    "exactly one component" becomes "flood from the lowest set bit covers
    every (face) bit" — two int32 planes of state instead of the 26 int8
    label planes of ``_deletable_arith``, ~4x less HBM traffic."""
    sel = fg if where is None else (fg & where)
    occ_full = _pack26(fg)

    # condition 1: one 26-connected component among occupied cells
    occ = jnp.where(sel, occ_full, 0)
    start1 = occ & (-occ)  # lowest occupied cell
    reach1 = _flood_bits(occ, start1, tuple(enumerate(_ADJ26_MASKS)))
    cond1 = (occ != 0) & (reach1 == occ)
    multi_fg = (occ & (occ - 1)) != 0  # not endpoint / isolated

    # condition 2: one 6-connected bg component in N18 touching a face
    bg = jnp.where(sel, (~occ_full) & _N18_MASK, 0)
    bg_face = bg & _FACE_MASK
    start2 = bg_face & (-bg_face)
    reach2 = _flood_bits(bg, start2, _ADJ6_MASKS)
    cond2 = (bg_face != 0) & ((bg_face & ~reach2) == 0)

    return cond1 & cond2 & multi_fg & sel


_DIRECTIONS = ((-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1))


@partial(jax.jit, static_argnames=("backend",))
def skeletonize_3d(mask: jnp.ndarray, backend: str = "packed") -> jnp.ndarray:
    """3D curve thinning; preserves 26-connectivity of fg and 6-topology.

    backend='packed' (default) evaluates the simple-point test on
    bit-packed neighbourhoods (one int32 plane of flood state — fastest);
    'arith' propagates int8 labels over 26 planes; 'lut' gathers from the
    precomputed 8 MiB table.  All three produce identical results
    (tested in test_skeleton_backends.py)."""
    if backend == "lut":
        lut = jnp.asarray(get_simple26_lut())
        deletable = lambda cur, where: _deletable(cur, lut, where=where)  # noqa: E731
    elif backend == "arith":
        deletable = lambda cur, where: _deletable_arith(cur, where=where)  # noqa: E731
    else:
        deletable = lambda cur, where: _deletable_packed(cur, where=where)  # noqa: E731
    iz = lax.broadcasted_iota(jnp.int32, mask.shape, 0)
    iy = lax.broadcasted_iota(jnp.int32, mask.shape, 1)
    ix = lax.broadcasted_iota(jnp.int32, mask.shape, 2)
    parity = (iz % 2) * 4 + (iy % 2) * 2 + (ix % 2)

    def one_direction(fg, d):
        # Lee-style subiteration: the candidate set is FIXED to the
        # direction-d border layer at pass start (so each sweep peels one
        # layer per direction — deep one-sided erosion would collapse tubes
        # into sheets).  Within the pass, simplicity is RE-CHECKED against
        # the current image as deletions land (fresh pack + LUT gather per
        # inner round), and each round commits a conflict-free subset: a
        # candidate is blocked by any 26-adjacent candidate of lower parity
        # index.  The committed set is pairwise non-adjacent (equal parity
        # is never adjacent), so the parallel commit is equivalent to some
        # sequential order of simple-point deletions — topology-preserving.
        # Candidates that lose simplicity are dropped (Lee's skip); any
        # nonempty still-simple set has an unblocked member (its
        # cluster-minimum parity), so the inner loop can't stall.
        neighbor_d = _shift3(fg, _DIRECTIONS[d], False)
        border = fg & ~neighbor_d
        cand0 = deletable(fg, border)

        def body(state):
            cur, remaining, _ = state
            del_now = deletable(cur, remaining)
            blocked = jnp.zeros_like(del_now)
            for off in OFFSETS_26:
                flip = ((abs(off[0]) % 2) << 2) | ((abs(off[1]) % 2) << 1) | (abs(off[2]) % 2)
                nb_cand = _shift3(del_now, off, False)
                nb_parity = parity ^ flip  # parity index of the voxel at +off
                blocked = blocked | (nb_cand & (nb_parity < parity))
            commit = del_now & ~blocked
            cur = cur & ~commit
            remaining = del_now & ~commit
            return cur, remaining, jnp.any(commit)

        fg, _, _ = lax.while_loop(lambda s: s[2], body, (fg, cand0, jnp.any(cand0)))
        return fg

    def body(state):
        fg, _ = state
        new = fg
        for d in range(6):
            new = one_direction(new, d)
        return new, jnp.any(new != fg)

    def cond(state):
        return state[1]

    fg, _ = lax.while_loop(cond, body, (mask.astype(bool), jnp.bool_(True)))
    return fg


# --------------------------------------------------------------------------
# 2D: Zhang–Suen
# --------------------------------------------------------------------------

# P2..P9 clockwise from north, offsets (dy, dx)
_P_OFFS = ((-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1))


def _zs_neighbors(fg):
    return [(_shift3(fg, off, False)).astype(jnp.int32) for off in _P_OFFS]


def _zs_pass(fg, first: bool):
    p = _zs_neighbors(fg)
    b = sum(p)
    seq = p + [p[0]]
    a = sum(((seq[i] == 0) & (seq[i + 1] == 1)).astype(jnp.int32) for i in range(8))
    p2, p4, p6, p8 = p[0], p[2], p[4], p[6]
    if first:
        c1 = (p2 * p4 * p6) == 0
        c2 = (p4 * p6 * p8) == 0
    else:
        c1 = (p2 * p4 * p8) == 0
        c2 = (p2 * p6 * p8) == 0
    delete = fg & (b >= 2) & (b <= 6) & (a == 1) & c1 & c2
    return fg & ~delete


@jax.jit
def skeletonize_2d(mask: jnp.ndarray) -> jnp.ndarray:
    def body(state):
        fg, _ = state
        new = _zs_pass(fg, True)
        new = _zs_pass(new, False)
        return new, jnp.any(new != fg)

    fg, _ = lax.while_loop(lambda s: s[1], body, (mask.astype(bool), jnp.bool_(True)))
    return fg


def skeletonize(mask: jnp.ndarray) -> jnp.ndarray:
    """Dimension dispatch (2D Zhang–Suen / 3D LUT thinning)."""
    if mask.ndim == 2:
        return skeletonize_2d(mask)
    if mask.ndim == 3:
        return skeletonize_3d(mask)
    raise ValueError(f"skeletonize supports 2D/3D, got {mask.ndim}D")
