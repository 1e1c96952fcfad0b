"""Batched image moments, Hu invariants and ROI statistics.

TPU-native replacement for the reference's broadcasting-heavy moment
tensors (``/root/reference/nellie/tracking/hu_tracking.py:228-344``).
The reference materialises (N, H, W, 4, 4) products; here raw moments
are two einsums onto the MXU::

    M[n, p, q] = Σ_hw im[n, h, w] · col[w]^p · row[h]^q

and central moments follow *exactly* from the raw ones via the binomial
transform (no (x − x̄) image tensors)::

    μ_pq = Σ_{i≤p, j≤q} C(p,i) C(q,j) (−x̄)^{p−i} (−ȳ)^{q−j} M_ij

Then η normalisation and the first six Hu invariants (the 7th is skipped
for mirror invariance, matching ``hu_tracking.py:304-317``).
"""
from __future__ import annotations

from math import comb

import jax.numpy as jnp


def raw_moments(images: jnp.ndarray, order: int = 3) -> jnp.ndarray:
    """Raw moments M[n, p, q] with p = column(x) power, q = row(y) power.

    images: (N, H, W) float32.  Returns (N, order+1, order+1).
    """
    n, h, w = images.shape
    k = order + 1
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    row_pow = rows[:, None] ** jnp.arange(k, dtype=jnp.float32)[None, :]  # (H, K)
    col_pow = cols[:, None] ** jnp.arange(k, dtype=jnp.float32)[None, :]  # (W, K)
    # two MXU contractions: (N,H,W)x(W,K) -> (N,H,K); (N,H,K)x(H,K)->(N,K,K)
    tmp = jnp.einsum("nhw,wp->nhp", images, col_pow, preferred_element_type=jnp.float32)
    m = jnp.einsum("nhp,hq->npq", tmp, row_pow, preferred_element_type=jnp.float32)
    return m


def central_moments(m: jnp.ndarray) -> jnp.ndarray:
    """Binomial transform raw -> central moments, same (N, K, K) layout."""
    k = m.shape[1]
    m00 = m[:, 0, 0] + 1e-12
    x_bar = m[:, 1, 0] / m00
    y_bar = m[:, 0, 1] / m00
    mu = jnp.zeros_like(m)
    for p in range(k):
        for q in range(k):
            acc = jnp.zeros_like(m00)
            for i in range(p + 1):
                for j in range(q + 1):
                    coeff = comb(p, i) * comb(q, j)
                    acc = acc + coeff * ((-x_bar) ** (p - i)) * ((-y_bar) ** (q - j)) * m[:, i, j]
            mu = mu.at[:, p, q].set(acc)
    return mu


def normalized_moments(images: jnp.ndarray) -> jnp.ndarray:
    """η moments up to order 3, shape (N, 4, 4) (``hu_tracking.py:228-276``)."""
    m = raw_moments(images, order=3)
    mu = central_moments(m)
    i_plus_j = jnp.arange(4)[:, None] + jnp.arange(4)[None, :]
    denom = (m[:, 0, 0][:, None, None] ** ((i_plus_j[None] + 2) / 2.0)) + 1e-12
    return mu / denom


def hu_moments(eta: jnp.ndarray) -> jnp.ndarray:
    """First six Hu moments (no 7th: mirror invariance), shape (N, 6)."""
    eta20, eta02, eta11 = eta[:, 2, 0], eta[:, 0, 2], eta[:, 1, 1]
    eta30, eta12, eta21, eta03 = eta[:, 3, 0], eta[:, 1, 2], eta[:, 2, 1], eta[:, 0, 3]
    h0 = eta20 + eta02
    h1 = (eta20 - eta02) ** 2 + 4 * eta11**2
    h2 = (eta30 - 3 * eta12) ** 2 + (3 * eta21 - eta03) ** 2
    h3 = (eta30 + eta12) ** 2 + (eta21 + eta03) ** 2
    h4 = (
        (eta30 - 3 * eta12) * (eta30 + eta12)
        * ((eta30 + eta12) ** 2 - 3 * (eta21 + eta03) ** 2)
        + (3 * eta21 - eta03) * (eta21 + eta03)
        * (3 * (eta30 + eta12) ** 2 - (eta21 + eta03) ** 2)
    )
    h5 = (
        (eta20 - eta02) * ((eta30 + eta12) ** 2 - (eta21 + eta03) ** 2)
        + 4 * eta11 * (eta30 + eta12) * (eta21 + eta03)
    )
    return jnp.stack([h0, h1, h2, h3, h4, h5], axis=1)


def log_hu(hu: jnp.ndarray) -> jnp.ndarray:
    """Sign-stable log10 transform (``hu_tracking.py:319-342``)."""
    abs_hu = jnp.maximum(jnp.abs(hu), jnp.finfo(hu.dtype).tiny)
    out = -jnp.sign(hu) * jnp.log10(abs_hu)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def hu_2d(images: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) -> (N, 6) Hu features."""
    return hu_moments(normalized_moments(images))


def hu_3d(volumes: jnp.ndarray) -> jnp.ndarray:
    """(N, Z, Y, X) -> (N, 18): Hu of the three orthogonal max projections
    (``hu_tracking.py:472-516``)."""
    z_proj = jnp.max(volumes, axis=1)
    y_proj = jnp.max(volumes, axis=2)
    x_proj = jnp.max(volumes, axis=3)
    return jnp.concatenate([hu_2d(z_proj), hu_2d(y_proj), hu_2d(x_proj)], axis=1)


def masked_mean_variance(images: jnp.ndarray) -> jnp.ndarray:
    """[mean, variance] of nonzero voxels per image, (N, 2)
    (``hu_tracking.py:344-386``)."""
    axes = tuple(range(1, images.ndim))
    mask = images != 0
    count = jnp.sum(mask, axis=axes)
    safe = jnp.where(count == 0, 1, count)
    total = jnp.sum(images * mask, axis=axes)
    total_sq = jnp.sum((images * mask) ** 2, axis=axes)
    mean = total / safe
    var = (total_sq - total**2 / safe) / safe
    mean = jnp.where(count == 0, 0.0, mean)
    var = jnp.where(count == 0, 0.0, var)
    return jnp.stack([mean, var], axis=1).astype(jnp.float32)
