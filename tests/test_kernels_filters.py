"""Kernel parity tests vs scipy/numpy ground truth (CPU)."""
import numpy as np
import pytest
import scipy.ndimage as ndi

from nellie_tpu.kernels import eigen, filters, thresholds
from nellie_tpu.kernels.hessian import gradient, hessian_components

import jax.numpy as jnp


@pytest.mark.parametrize("sigma", [(1.0, 1.0), (2.3, 0.9)])
def test_gaussian_filter_2d_matches_scipy(rng, sigma):
    x = rng.random((40, 50)).astype(np.float32)
    ours = np.asarray(filters.gaussian_filter(jnp.asarray(x), sigma, truncate=3.0))
    ref = ndi.gaussian_filter(x, sigma=sigma, mode="reflect", truncate=3.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_gaussian_filter_3d_anisotropic(rng):
    x = rng.random((12, 30, 31)).astype(np.float32)
    sigma = (0.7, 1.9, 1.9)
    ours = np.asarray(filters.gaussian_filter(jnp.asarray(x), sigma, truncate=3.0))
    ref = ndi.gaussian_filter(x, sigma=sigma, mode="reflect", truncate=3.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_gaussian_laplace_matches_scipy(rng):
    x = rng.random((24, 25)).astype(np.float32)
    sigma = (1.5, 1.5)
    ours = np.asarray(filters.gaussian_laplace(jnp.asarray(x), sigma))
    ref = ndi.gaussian_laplace(x, sigma=sigma, mode="reflect")
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_gradient_matches_numpy(rng):
    x = rng.random((9, 11, 13)).astype(np.float32)
    for axis, spacing in [(0, 0.5), (1, 0.2), (2, 1.7)]:
        ours = np.asarray(gradient(jnp.asarray(x), spacing, axis))
        ref = np.gradient(x, spacing, axis=axis)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_hessian_components_match_double_gradient(rng):
    x = ndi.gaussian_filter(rng.random((10, 12, 14)), 1.5).astype(np.float32)
    spacing = (0.5, 0.2, 0.2)
    h, frob = hessian_components(jnp.asarray(x), spacing)
    g0 = np.gradient(x, spacing[0], axis=0)
    ref_hxy = np.gradient(g0, spacing[1], axis=1)
    np.testing.assert_allclose(np.asarray(h["hxy"]), ref_hxy, rtol=1e-3, atol=1e-4)
    assert np.asarray(frob).max() <= np.sqrt(6.0) + 1e-3  # normalised


def test_eigvalsh3_matches_lapack(rng):
    n = 2000
    m = rng.normal(size=(n, 3, 3)).astype(np.float32)
    m = (m + m.transpose(0, 2, 1)) / 2
    hxx, hxy, hxz = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    hyy, hyz, hzz = m[:, 1, 1], m[:, 1, 2], m[:, 2, 2]
    l1, l2, l3 = [np.asarray(v) for v in eigen.eigvalsh3(
        jnp.asarray(hxx), jnp.asarray(hxy), jnp.asarray(hxz),
        jnp.asarray(hyy), jnp.asarray(hyz), jnp.asarray(hzz))]
    ref = np.linalg.eigvalsh(m.astype(np.float64))
    order = np.argsort(np.abs(ref), axis=1)
    ref_sorted = np.take_along_axis(ref, order, axis=1)
    ours = np.stack([l1, l2, l3], axis=1)
    scale = np.abs(ref_sorted).max(axis=1, keepdims=True) + 1e-6
    np.testing.assert_allclose(ours / scale, ref_sorted / scale, atol=5e-5)


def test_eigvalsh2_matches_lapack(rng):
    n = 1000
    m = rng.normal(size=(n, 2, 2)).astype(np.float32)
    m = (m + m.transpose(0, 2, 1)) / 2
    e1, e2 = eigen.eigvalsh2(jnp.asarray(m[:, 0, 0]), jnp.asarray(m[:, 0, 1]), jnp.asarray(m[:, 1, 1]))
    ref = np.linalg.eigvalsh(m.astype(np.float64))
    order = np.argsort(np.abs(ref), axis=1)
    ref_sorted = np.take_along_axis(ref, order, axis=1)
    ours = np.stack([np.asarray(e1), np.asarray(e2)], axis=1)
    np.testing.assert_allclose(ours, ref_sorted, atol=1e-4)


# -- thresholds: compare against a direct numpy port of the reference semantics


def _np_otsu(matrix, nbins=256):
    flat = matrix.reshape(-1)
    counts, bin_edges = np.histogram(flat, bins=nbins, range=(flat.min(), flat.max()))
    centers = (bin_edges[:-1] + bin_edges[1:]) / 2.0
    counts = counts / counts.sum()
    w1 = np.cumsum(counts)
    m1 = np.divide(np.cumsum(counts * centers), w1, out=np.zeros_like(w1), where=w1 > 0)
    w2 = np.cumsum(counts[::-1])[::-1]
    m2r = np.divide(
        np.cumsum((counts * centers)[::-1]), np.cumsum(counts[::-1]),
        out=np.zeros(nbins), where=np.cumsum(counts[::-1]) > 0,
    )
    m2 = m2r[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return centers[np.argmax(var12)]


def _np_triangle(matrix, nbins=256):
    flat = matrix.reshape(-1)
    hist, bin_edges = np.histogram(flat, bins=nbins, range=(flat.min(), flat.max()))
    centers = (bin_edges[:-1] + bin_edges[1:]) / 2.0
    hist = hist / hist.sum()
    arg_peak = int(np.argmax(hist))
    peak_height = hist[arg_peak]
    nz = np.flatnonzero(hist)
    arg_low, arg_high = nz[0], nz[-1]
    flip = arg_peak - arg_low < arg_high - arg_peak
    if flip:
        hist = np.flip(hist)
        arg_low = nbins - arg_high - 1
        arg_peak = nbins - arg_peak - 1
    width = arg_peak - arg_low
    x1 = np.arange(width)
    y1 = hist[x1 + arg_low]
    norm = np.sqrt(peak_height**2 + width**2)
    ph, wd = peak_height / norm, width / norm
    arg_level = np.argmax(ph * x1 - wd * y1) + arg_low
    if flip:
        arg_level = nbins - arg_level - 1
    return centers[arg_level]


def test_otsu_matches_reference_semantics(rng):
    data = np.concatenate([
        rng.normal(10, 2, 5000), rng.normal(60, 8, 3000)
    ]).astype(np.float32)
    data = data[data > 0]
    ours = float(thresholds.otsu_threshold(jnp.asarray(data))[0])
    ref = _np_otsu(data)
    # bin-quantised threshold: allow one bin of slack
    bin_width = (data.max() - data.min()) / 256
    assert abs(ours - ref) <= bin_width + 1e-4


def test_triangle_matches_reference_semantics(rng):
    data = np.concatenate([
        rng.exponential(5, 20000), rng.normal(80, 5, 500)
    ]).astype(np.float32)
    data = data[data > 0]
    ours = float(thresholds.triangle_threshold(jnp.asarray(data)))
    ref = _np_triangle(data)
    bin_width = (data.max() - data.min()) / 256
    assert abs(ours - ref) <= bin_width + 1e-4


def test_thresholds_with_mask_equals_filtering(rng):
    data = rng.normal(5, 3, 10000).astype(np.float32)
    mask = data > 0
    ours = float(thresholds.otsu_threshold(jnp.asarray(data), jnp.asarray(mask))[0])
    ref = _np_otsu(data[mask])
    bin_width = (data[mask].max() - data[mask].min()) / 256
    assert abs(ours - ref) <= bin_width + 1e-4


def test_bincount_matmul_exact_vs_numpy(rng):
    """The radix-16 MXU bincount must equal np.bincount exactly (0/1
    bf16 one-hots, f32 accumulation), incl. the overflow-bin drop and
    non-multiple-of-16 nbins."""
    import jax

    for n, nbins in ((1_000_000, 256), (16384, 256), (100, 256),
                     (524288, 200), (7, 16), (3, 1)):
        idx = rng.integers(0, nbins + 1, n).astype(np.int32)  # incl. overflow
        ours = np.asarray(jax.jit(
            thresholds._bincount_tiled, static_argnums=1)(jnp.asarray(idx), nbins))
        ref = np.bincount(idx[idx < nbins], minlength=nbins).astype(np.float32)
        assert ours.shape == (nbins,)
        np.testing.assert_array_equal(ours, ref)


def test_stride_mask_selects_downsample_positions(rng):
    """stride_mask must pick exactly the positions downsample() gathers,
    so mask-sampled histograms see the identical sample set."""
    for shape, strides in (((64, 256, 256), (2, 2, 2)), ((33, 17), (3, 1)),
                           ((10,), (4,)), ((8, 8, 8), (1, 1, 1))):
        m = np.asarray(thresholds.stride_mask(shape, strides))
        expect = np.zeros(shape, bool)
        expect[tuple(slice(None, None, s) for s in strides)] = True
        np.testing.assert_array_equal(m, expect)


def test_masked_histogram_stride_mask_equals_gather(rng):
    """min(triangle, otsu) over (full volume, stride mask) must equal the
    gathered-sample call bit-for-bit."""
    vol = rng.normal(4, 3, (24, 40, 56)).astype(np.float32)
    strides = (2, 2, 2)
    gathered = vol[tuple(slice(None, None, s) for s in strides)]
    ref = float(thresholds.min_triangle_otsu(
        jnp.asarray(gathered), jnp.asarray(gathered > 0)))
    m = thresholds.stride_mask(vol.shape, strides) & (jnp.asarray(vol) > 0)
    ours = float(thresholds.min_triangle_otsu(jnp.asarray(vol), m))
    assert ours == ref


def test_rank_filters_match_scipy(rng):
    x = rng.random((15, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(filters.maximum_filter(jnp.asarray(x), 3)),
        ndi.maximum_filter(x, size=3, mode="reflect"),
    )
    np.testing.assert_array_equal(
        np.asarray(filters.minimum_filter(jnp.asarray(x), 3)),
        ndi.minimum_filter(x, size=3, mode="reflect"),
    )
    np.testing.assert_allclose(
        np.asarray(filters.uniform_filter(jnp.asarray(x), 3)),
        ndi.uniform_filter(x, size=3, mode="reflect"),
        rtol=1e-5, atol=1e-6,
    )


def test_binary_opening_matches_scipy(rng):
    mask = rng.random((20, 21)) > 0.4
    ours = np.asarray(filters.binary_opening(jnp.asarray(mask)))
    ref = ndi.binary_opening(mask)
    np.testing.assert_array_equal(ours, ref)


def test_binary_opening_matches_scipy_3d(rng):
    mask = rng.random((10, 12, 13)) > 0.3
    ours = np.asarray(filters.binary_opening(jnp.asarray(mask)))
    ref = ndi.binary_opening(mask)
    np.testing.assert_array_equal(ours, ref)
