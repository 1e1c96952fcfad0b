"""Halo-padded chunk iteration for out-of-HBM spatial processing.

Same semantics as the reference's chunk iterator
(``/root/reference/nellie/segmentation/filtering.py:855-877``): split a
volume into core chunks, extend each by a per-axis halo clamped to the
volume bounds, and yield (core, extended, core-within-extended) slices.
The mesh layer reuses the same halo arithmetic for ICI halo exchange.
"""
from __future__ import annotations

import itertools
from functools import partial

import numpy as np

import jax


@partial(jax.jit, static_argnames=("size",))
def crop_core(v, offsets, size):
    """Static-size core crop at a traced offset — one compiled program for
    every window position of the uniform tiling."""
    starts = tuple(offsets[i] for i in range(len(size)))
    return jax.lax.dynamic_slice(v, starts, size)


def compute_chunk_shape(shape, max_chunk_voxels):
    if max_chunk_voxels is None or max_chunk_voxels <= 0:
        return tuple(shape)
    chunk = list(shape)
    while int(np.prod(chunk)) > max_chunk_voxels:
        idx = int(np.argmax(chunk))
        chunk[idx] = max(1, int(np.ceil(chunk[idx] / 2)))
    return tuple(chunk)


def _align_up(n, m):
    return ((n + m - 1) // m) * m


def _tile_alignments(ndim):
    """TPU-friendly per-axis size multiples: minor axis = lane width (128),
    second-minor = sublane (8). Misaligned window shapes cost up to ~40x
    on the fused Frangi kernel (measured: (260,266,266) 3.5 Mvox/s vs
    (264,272,384) 151 Mvox/s on v5e)."""
    align = [1] * ndim
    if ndim >= 1:
        align[-1] = 128
    if ndim >= 2:
        align[-2] = 8
    return align


def uniform_window_shapes(shape, chunk_shape, halo):
    """(core_shape, ext_shape) for the static-shape window tiling.

    The extended shape is rounded up to TPU tile alignment (extra context
    beyond the required halo is harmless — values are window-invariant),
    clipped to the volume."""
    core_shape = tuple(min(d, c) for d, c in zip(shape, chunk_shape))
    align = _tile_alignments(len(shape))
    ext_shape = tuple(
        min(d, _align_up(c + 2 * h, a))
        for d, c, h, a in zip(shape, core_shape, halo, align))
    return core_shape, ext_shape


def iter_uniform_windows(shape, chunk_shape, halo):
    """Static-shape halo windows: every core is exactly ``core_shape`` and
    every extended window is exactly ``ext_shape`` — so one XLA program
    covers every chunk (the round-1 ragged iterator recompiled per edge
    shape). Final windows along each axis shift inward, overlapping the
    previous core; overlap writes are value-identical because both
    windows see >= halo context (or the true volume edge), so the same
    stencil math runs on the same data.

    Yields (core, ext, offset): ``core``/``ext`` are source-volume slice
    tuples; ``offset`` is the core's start within the extended window
    (for a static-size dynamic_slice on device).
    """
    if halo is None or len(halo) != len(shape):
        halo = (0,) * len(shape)
    core_shape, ext_shape = uniform_window_shapes(shape, chunk_shape, halo)
    axis_starts = []
    for d, c in zip(shape, core_shape):
        starts = list(range(0, d - c + 1, c))
        if starts[-1] != d - c:
            starts.append(d - c)
        axis_starts.append(starts)
    for starts in itertools.product(*axis_starts):
        ext_start = tuple(
            int(np.clip(s - h, 0, d - e))
            for s, h, d, e in zip(starts, halo, shape, ext_shape))
        core = tuple(slice(s, s + c) for s, c in zip(starts, core_shape))
        ext = tuple(slice(es, es + e) for es, e in zip(ext_start, ext_shape))
        offset = tuple(s - es for s, es in zip(starts, ext_start))
        yield core, ext, offset


def iter_chunks(shape, chunk_shape, halo):
    if halo is None or len(halo) != len(shape):
        halo = (0,) * len(shape)
    ranges = [range(0, dim, step) for dim, step in zip(shape, chunk_shape)]
    for starts in itertools.product(*ranges):
        ends = [min(s + step, dim) for s, step, dim in zip(starts, chunk_shape, shape)]
        core = tuple(slice(s, e) for s, e in zip(starts, ends))
        ext_starts = [max(0, s - h) for s, h in zip(starts, halo)]
        ext_ends = [min(dim, e + h) for e, h, dim in zip(ends, halo, shape)]
        ext = tuple(slice(s, e) for s, e in zip(ext_starts, ext_ends))
        core_in_ext = tuple(
            slice(s - es, e - es) for s, e, es in zip(starts, ends, ext_starts)
        )
        yield core, ext, core_in_ext
