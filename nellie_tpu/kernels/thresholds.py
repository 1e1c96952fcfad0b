"""Histogram thresholds (Otsu, triangle) as jittable, mask-aware JAX ops.

Semantics follow the reference's xp-agnostic implementations
(``/root/reference/nellie/utils/gpu_functions.py:23-94``): 256-bin
histogram over the data range, between-class-variance argmax (Otsu) and
perpendicular-distance-to-peak-line with flip logic (triangle).

Because XLA requires static shapes, "threshold the positive values only"
is expressed with a validity *mask* instead of boolean fancy-indexing;
min/max/histogram are computed under the mask.  When the mask is empty
both thresholds return 0.
"""
from __future__ import annotations

import jax.numpy as jnp


def _masked_histogram(values: jnp.ndarray, mask: jnp.ndarray, nbins: int):
    """Histogram of values[mask] over (masked min, masked max), numpy-style
    half-open bins with the last bin closed."""
    flat = values.reshape(-1).astype(jnp.float32)
    mflat = mask.reshape(-1)
    big = jnp.float32(jnp.inf)
    lo = jnp.min(jnp.where(mflat, flat, big))
    hi = jnp.max(jnp.where(mflat, flat, -big))
    any_valid = jnp.any(mflat)
    lo = jnp.where(any_valid, lo, 0.0)
    hi = jnp.where(any_valid, hi, 1.0)
    span = hi - lo
    safe_span = jnp.where(span > 0, span, 1.0)
    idx = jnp.floor((flat - lo) / safe_span * nbins).astype(jnp.int32)
    idx = jnp.clip(idx, 0, nbins - 1)
    idx = jnp.where(mflat, idx, nbins)  # masked-out -> overflow bin
    counts = _bincount_tiled(idx, nbins)
    edges_lo = lo + jnp.arange(nbins, dtype=jnp.float32) * (span / nbins)
    centers = edges_lo + span / (2 * nbins)
    return counts, centers, any_valid


def _bincount_tiled(idx: jnp.ndarray, nbins: int) -> jnp.ndarray:
    """Histogram counts as ONE MXU matmul via radix-16 factorization.

    TPUs serialize scatter-adds, so the bincount is recast as
    ``counts[h, l] = sum_n onehot(idx//16)[n, h] * onehot(idx%16)[n, l]``
    — a single (N, nbins/16)^T @ (N, 16) product whose row-major reshape
    IS the histogram (bin = 16*h + l).  One-hot operands are exactly 0/1
    in bfloat16 and the f32 accumulation is exact up to 2^24 counts, so
    the result is bit-identical to the scatter bincount for any sample
    budget this library uses (<=1e6).  The previous tiled
    compare+reduce lax.scan paid N*nbins VPU compares in ~62 serialized
    steps (~7.5 ms per 1e6-sample histogram on v5e — 10 histograms per
    Frangi frame made thresholds 2/3 of the vesselness wall clock);
    the matmul runs on the MXU in well under a millisecond.

    Values equal to ``nbins`` (the overflow bin) are dropped."""
    valid = idx < nbins
    a = -(-nbins // 16)
    hi = jnp.minimum(idx // 16, a - 1)
    lo = idx % 16
    oh_hi = ((hi[:, None] == jnp.arange(a, dtype=idx.dtype)[None, :])
             & valid[:, None]).astype(jnp.bfloat16)
    oh_lo = (lo[:, None] == jnp.arange(16, dtype=idx.dtype)[None, :]
             ).astype(jnp.bfloat16)
    counts = jnp.dot(oh_hi.T, oh_lo, preferred_element_type=jnp.float32)
    return counts.reshape(a * 16)[:nbins]


def otsu_threshold(values: jnp.ndarray, mask: jnp.ndarray | None = None, nbins: int = 256):
    """Otsu's threshold of values[mask]. Returns (threshold, criterion)."""
    if mask is None:
        mask = jnp.ones(values.shape, dtype=bool)
    return _otsu_from_hist(*_masked_histogram(values, mask, nbins))


def _otsu_from_hist(counts, centers, any_valid):
    nbins = counts.shape[0]
    total = jnp.sum(counts)
    p = counts / jnp.maximum(total, 1.0)

    weight1 = jnp.cumsum(p)
    cmeans = jnp.cumsum(p * centers)
    mean1 = cmeans / jnp.maximum(weight1, 1e-30)
    weight2 = jnp.cumsum(p[::-1])[::-1]
    mean2 = (jnp.cumsum((p * centers)[::-1]) / jnp.maximum(jnp.cumsum(p[::-1]), 1e-30))[::-1]

    variance12 = weight1[:-1] * weight2[1:] * (mean1[:-1] - mean2[1:]) ** 2
    idx = jnp.argmax(variance12)
    threshold = jnp.where(any_valid, centers[idx], 0.0)
    return threshold, variance12[idx]


def triangle_threshold(values: jnp.ndarray, mask: jnp.ndarray | None = None, nbins: int = 256):
    """Triangle threshold of values[mask]."""
    if mask is None:
        mask = jnp.ones(values.shape, dtype=bool)
    return _triangle_from_hist(*_masked_histogram(values, mask, nbins))


def _triangle_from_hist(counts, centers, any_valid):
    nbins = counts.shape[0]
    hist = counts / jnp.maximum(jnp.sum(counts), 1.0)

    arg_peak = jnp.argmax(hist)
    peak_height = hist[arg_peak]
    nonzero = hist > 0
    bins = jnp.arange(nbins)
    arg_low = jnp.min(jnp.where(nonzero, bins, nbins))
    arg_high = jnp.max(jnp.where(nonzero, bins, -1))

    flip = (arg_peak - arg_low) < (arg_high - arg_peak)
    hist_f = jnp.where(flip, hist[::-1], hist)
    arg_low_f = jnp.where(flip, nbins - arg_high - 1, arg_low)
    arg_peak_f = jnp.where(flip, nbins - arg_peak - 1, arg_peak)

    width = (arg_peak_f - arg_low_f).astype(jnp.float32)
    norm = jnp.sqrt(peak_height**2 + width**2)
    ph = peak_height / jnp.maximum(norm, 1e-30)
    wd = width / jnp.maximum(norm, 1e-30)

    # length of the perpendicular from the hypotenuse, evaluated on
    # bins in [arg_low_f, arg_peak_f); -inf elsewhere so argmax ignores them
    x1 = (bins - arg_low_f).astype(jnp.float32)
    valid = (bins >= arg_low_f) & (bins < arg_peak_f)
    length = jnp.where(valid, ph * x1 - wd * hist_f, -jnp.inf)
    # empty range (width == 0): fall back to the low bin itself
    has_range = jnp.any(valid)
    arg_level = jnp.where(has_range, jnp.argmax(length), arg_low_f)
    arg_level = jnp.where(flip, nbins - arg_level - 1, arg_level)
    return jnp.where(any_valid, centers[arg_level], 0.0)


def min_triangle_otsu(values: jnp.ndarray, mask: jnp.ndarray | None = None, nbins: int = 256):
    """min(triangle, otsu) — the reference's combined auto-threshold
    (``filtering.py:374-376``, ``labelling.py:449-455``).  One shared
    histogram feeds both decision rules."""
    if mask is None:
        mask = jnp.ones(values.shape, dtype=bool)
    hist = _masked_histogram(values, mask, nbins)
    tri = _triangle_from_hist(*hist)
    ots, _ = _otsu_from_hist(*hist)
    return jnp.minimum(tri, ots)


def sample_strides(shape, max_samples: int):
    """Static strided-downsampling factors so that prod(ceil(s/stride))
    <= max_samples (reference ``filtering.py:328-340``). Host-side helper —
    shapes are static under jit."""
    import numpy as np

    if max_samples is None or max_samples <= 0:
        return (1,) * len(shape)
    total = int(np.prod(shape))
    if total <= max_samples:
        return (1,) * len(shape)
    ndim = len(shape)
    stride = int(np.ceil((total / max_samples) ** (1.0 / ndim)))
    strides = [max(1, stride) for _ in range(ndim)]
    while int(np.prod([int(np.ceil(s / st)) for s, st in zip(shape, strides)])) > max_samples:
        idx = int(np.argmax([s / st for s, st in zip(shape, strides)]))
        strides[idx] += 1
    return tuple(strides)


def downsample(arr: jnp.ndarray, strides) -> jnp.ndarray:
    if all(s == 1 for s in strides):
        return arr
    return arr[tuple(slice(None, None, s) for s in strides)]


def stride_mask(shape, strides) -> jnp.ndarray:
    """Boolean mask selecting exactly the :func:`downsample` positions —
    histogram consumers apply it instead of gathering: a strided slice is
    a layout change on TPU (~6 ms per 4.2 Mvox frame, paid per scale in
    the Frangi cascade), while an iota-compare mask fuses into the
    histogram's elementwise pass for free.  Sort-based consumers
    (percentiles) still need the compact gather."""
    from jax import lax

    m = None
    for ax, s in enumerate(strides):
        if s <= 1:
            continue
        sel = lax.broadcasted_iota(jnp.int32, shape, ax) % s == 0
        m = sel if m is None else m & sel
    if m is None:
        return jnp.ones(shape, bool)
    return m
