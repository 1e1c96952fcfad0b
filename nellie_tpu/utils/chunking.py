"""Halo-padded chunk iteration for out-of-HBM spatial processing.

Same semantics as the reference's chunk iterator
(``/root/reference/nellie/segmentation/filtering.py:855-877``): split a
volume into core chunks, extend each by a per-axis halo clamped to the
volume bounds, and yield (core, extended, core-within-extended) slices.
The mesh layer reuses the same halo arithmetic for ICI halo exchange.
"""
from __future__ import annotations

import itertools

import numpy as np


def compute_chunk_shape(shape, max_chunk_voxels):
    if max_chunk_voxels is None or max_chunk_voxels <= 0:
        return tuple(shape)
    chunk = list(shape)
    while int(np.prod(chunk)) > max_chunk_voxels:
        idx = int(np.argmax(chunk))
        chunk[idx] = max(1, int(np.ceil(chunk[idx] / 2)))
    return tuple(chunk)


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
