"""Separable convolution filters: Gaussian, Laplacian-of-Gaussian, rank filters.

TPU-native replacements for ``scipy.ndimage.gaussian_filter`` /
``gaussian_laplace`` / ``maximum_filter`` / ``minimum_filter`` /
``uniform_filter`` as used throughout the reference pipeline
(e.g. ``filtering.py:828-835``, ``mocap_marking.py:493-509``,
``networking.py:261-293``, ``labelling.py:503-505``).

Design notes
------------
* Kernels are built host-side from *static* sigmas (they derive from
  config), so everything here traces to static-shape XLA ops.
* 1D convolutions are expressed as shifted-slice weighted sums over a
  reflect-padded array; XLA fuses the (2r+1) multiply-adds into a single
  loop over the volume, which is HBM-bandwidth bound — the same bound a
  hand-written stencil kernel would hit.
* Rank filters use ``lax.reduce_window`` which lowers to efficient TPU
  windowed reductions.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax


def gaussian_kernel1d(sigma: float, truncate: float = 3.0, order: int = 0) -> np.ndarray:
    """Sampled Gaussian (or its 2nd derivative) kernel, scipy-compatible.

    radius = int(truncate * sigma + 0.5); weights normalised to sum 1 for
    order 0.  For order 2 the kernel is the exact second derivative of the
    normalised sampled Gaussian (matches scipy.ndimage._gaussian_kernel1d).
    """
    sigma = float(sigma)
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    sigma2 = sigma * sigma
    phi = np.exp(-0.5 * x * x / sigma2)
    phi = phi / phi.sum()
    if order == 0:
        return phi
    if order == 1:
        return phi * (-x / sigma2)
    if order == 2:
        return phi * ((x * x - sigma2) / (sigma2 * sigma2))
    raise ValueError(f"Unsupported order {order}")


def _correlate1d(x: jnp.ndarray, weights: np.ndarray, axis: int) -> jnp.ndarray:
    """Correlate along ``axis`` with reflect ('symmetric') boundary."""
    radius = len(weights) // 2
    if radius == 0:
        return x * float(weights[0])
    # scipy 'reflect' == numpy pad 'symmetric'
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    xp = jnp.pad(x, pad, mode="symmetric")
    n = x.shape[axis]
    out = None
    for k, w in enumerate(weights):
        w = float(w)
        if w == 0.0:
            continue
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + n)
        term = xp[tuple(sl)] * w
        out = term if out is None else out + term
    return out if out is not None else jnp.zeros_like(x)


def correlate1d_traced(x: jnp.ndarray, weights: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Correlate with a *traced* weight vector of static length (the taps
    may be zero-padded).  Lets lax.scan share one compiled body across
    filter scales with different kernels."""
    taps = int(weights.shape[0])
    radius = taps // 2
    if radius == 0:
        return x * weights[0]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    xp = jnp.pad(x, pad, mode="symmetric")
    n = x.shape[axis]
    out = jnp.zeros_like(x)
    for k in range(taps):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + n)
        out = out + xp[tuple(sl)] * weights[k]
    return out


def gaussian_kernel1d_padded(sigma: float, taps: int, truncate: float = 3.0) -> np.ndarray:
    """Gaussian taps centre-padded with zeros to a fixed static length.

    Zero taps contribute nothing, so a padded kernel is exactly the
    unpadded one; identity (sigma<=0) becomes a centred delta."""
    out = np.zeros(taps, np.float64)
    center = taps // 2
    if sigma <= 0:
        out[center] = 1.0
        return out
    k = gaussian_kernel1d(sigma, truncate)
    r = len(k) // 2
    if 2 * r + 1 > taps:
        raise ValueError(f"kernel radius {r} exceeds padded taps {taps}")
    out[center - r : center + r + 1] = k
    return out


def gaussian_filter(
    x: jnp.ndarray,
    sigma: Sequence[float],
    truncate: float = 3.0,
) -> jnp.ndarray:
    """Separable ND Gaussian blur with scipy 'reflect' boundary.

    ``sigma`` is one static float per axis (0 skips the axis), as in the
    reference's anisotropic sigma vectors (``filtering.py:277-286``).
    """
    sigma = tuple(float(s) for s in sigma)
    if len(sigma) != x.ndim:
        raise ValueError("sigma must have one entry per axis")
    out = x
    for axis, s in enumerate(sigma):
        if s > 0:
            out = _correlate1d(out, gaussian_kernel1d(s, truncate), axis)
    return out


def gaussian_laplace(
    x: jnp.ndarray,
    sigma: Sequence[float],
    truncate: float = 4.0,
) -> jnp.ndarray:
    """Laplacian of Gaussian: sum over axes of d²/daxis² Gaussian responses.

    Matches ``scipy.ndimage.gaussian_laplace`` (used by the reference's
    multiscale LoG peak detection, ``mocap_marking.py:493-509`` and the
    2D blobness path ``filtering.py:772-795``).
    """
    sigma = tuple(float(s) for s in sigma)
    if len(sigma) != x.ndim:
        raise ValueError("sigma must have one entry per axis")
    total = None
    for d2_axis in range(x.ndim):
        term = x
        for axis, s in enumerate(sigma):
            if s <= 0:
                continue
            order = 2 if axis == d2_axis else 0
            term = _correlate1d(term, gaussian_kernel1d(s, truncate, order=order), axis)
        total = term if total is None else total + term
    return total


# --------------------------------------------------------------------------
# Rank / uniform filters via reduce_window
# --------------------------------------------------------------------------

def _window_dims(x: jnp.ndarray, size) -> Tuple[int, ...]:
    if isinstance(size, int):
        return (size,) * x.ndim
    return tuple(int(s) for s in size)


def maximum_filter(x: jnp.ndarray, size=3, mode: str = "reflect", cval=0) -> jnp.ndarray:
    """ND maximum filter. mode 'reflect' (scipy default) or 'constant'."""
    dims = _window_dims(x, size)
    pads = [(d // 2, d // 2) for d in dims]
    if mode == "constant":
        xp = jnp.pad(x, pads, mode="constant", constant_values=cval)
    else:
        xp = jnp.pad(x, pads, mode="symmetric")
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        xp, jnp.asarray(init, x.dtype), lax.max, dims, (1,) * x.ndim, "valid",
    )


def minimum_filter(x: jnp.ndarray, size=3, mode: str = "reflect", cval=0) -> jnp.ndarray:
    dims = _window_dims(x, size)
    pads = [(d // 2, d // 2) for d in dims]
    if mode == "constant":
        xp = jnp.pad(x, pads, mode="constant", constant_values=cval)
    else:
        xp = jnp.pad(x, pads, mode="symmetric")
    init = jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).max
    return lax.reduce_window(
        xp, jnp.asarray(init, x.dtype), lax.min, dims, (1,) * x.ndim, "valid",
    )


def uniform_filter(x: jnp.ndarray, size=3) -> jnp.ndarray:
    """ND box mean filter (reflect boundary), as in ``labelling.py:503-505``."""
    dims = _window_dims(x, size)
    pads = [(d // 2, d // 2) for d in dims]
    xf = x.astype(jnp.float32)
    xp = jnp.pad(xf, pads, mode="symmetric")
    summed = lax.reduce_window(xp, 0.0, lax.add, dims, (1,) * x.ndim, "valid")
    return summed / float(np.prod(dims))


def sum_filter(x: jnp.ndarray, size=3) -> jnp.ndarray:
    """ND box sum with zero ('constant') boundary — the reference's 3³
    convolution for skeleton pixel classification (``networking.py:669``)."""
    dims = _window_dims(x, size)
    pads = [(d // 2, d // 2) for d in dims]
    xp = jnp.pad(x, pads, mode="constant")
    return lax.reduce_window(xp, jnp.zeros((), x.dtype), lax.add, dims, (1,) * x.ndim, "valid")


# --------------------------------------------------------------------------
# Binary morphology
# --------------------------------------------------------------------------

def binary_dilation(mask: jnp.ndarray, connectivity: int | None = None, size: int = 3) -> jnp.ndarray:
    """Binary dilation.

    ``connectivity=1`` uses the cross (6/4-neighbour) structuring element
    (scipy's default ``generate_binary_structure(ndim, 1)``); otherwise a
    full ``size``³ box.
    """
    if connectivity == 1:
        out = mask
        shifted = [mask]
        for axis in range(mask.ndim):
            shifted.append(_shift_fill(mask, axis, 1, False))
            shifted.append(_shift_fill(mask, axis, -1, False))
        out = shifted[0]
        for s in shifted[1:]:
            out = out | s
        return out
    return maximum_filter(mask.astype(jnp.uint8), size=size).astype(bool)


def binary_erosion(mask: jnp.ndarray, connectivity: int | None = None, size: int = 3) -> jnp.ndarray:
    """Binary erosion with scipy's default border_value=0 (borders erode)."""
    if connectivity == 1:
        out = mask
        for axis in range(mask.ndim):
            out = out & _shift_fill(mask, axis, 1, False) & _shift_fill(mask, axis, -1, False)
        return out
    import itertools

    r = size // 2
    out = mask
    for offsets in itertools.product(range(-r, r + 1), repeat=mask.ndim):
        if all(o == 0 for o in offsets):
            continue
        shifted = mask
        for axis, o in enumerate(offsets):
            if o != 0:
                shifted = _shift_fill(shifted, axis, o, False)
        out = out & shifted
    return out


def binary_opening(mask: jnp.ndarray, connectivity: int = 1) -> jnp.ndarray:
    """scipy.ndimage.binary_opening default: cross-shaped structure, one
    erosion then one dilation (``filtering.py:965``)."""
    # scipy erosion with border_value=0: out-of-bounds counts as background
    er = mask
    for axis in range(mask.ndim):
        er = er & _shift_fill(mask, axis, 1, False) & _shift_fill(mask, axis, -1, False)
    return binary_dilation(er, connectivity=connectivity)


def _shift_fill(x: jnp.ndarray, axis: int, shift: int, fill) -> jnp.ndarray:
    """Shift along axis by ``shift`` (positive = take from higher index),
    filling vacated positions with ``fill``."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    if shift > 0:
        pad[axis] = (0, shift)
        sl = slice(shift, shift + n)
    else:
        pad[axis] = (-shift, 0)
        sl = slice(0, n)
    xp = jnp.pad(x, pad, mode="constant", constant_values=fill)
    index = [slice(None)] * x.ndim
    index[axis] = sl
    return xp[tuple(index)]


def shift_fill(x, axis, shift, fill):
    """Public alias used by neighbourhood-stencil kernels."""
    return _shift_fill(x, axis, shift, fill)
