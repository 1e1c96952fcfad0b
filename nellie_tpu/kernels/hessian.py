"""Gradients and Hessian stencils with physical spacing.

Replaces the reference's double ``xp.gradient`` Hessian
(``/root/reference/nellie/segmentation/filtering.py:446-569``):
central differences in the interior, one-sided at the edges, divided by
the physical voxel spacing per axis.  Returns the packed unique
components of the symmetric Hessian, which feed the closed-form
eigensolvers in ``nellie_tpu.kernels.eigen``.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp


def gradient(f: jnp.ndarray, spacing: float, axis: int) -> jnp.ndarray:
    """np.gradient semantics along one axis with uniform spacing."""
    n = f.shape[axis]
    if n < 2:
        return jnp.zeros_like(f)

    def sl(a, b):
        index = [slice(None)] * f.ndim
        index[axis] = slice(a, b)
        return f[tuple(index)]

    inv = 1.0 / float(spacing)
    interior = (sl(2, None) - sl(None, -2)) * (0.5 * inv)
    first = (sl(1, 2) - sl(0, 1)) * inv
    last = (sl(-1, None) - sl(-2, -1)) * inv
    return jnp.concatenate([first, interior, last], axis=axis)


def hessian_components(
    image: jnp.ndarray, spacing: Sequence[float]
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """All unique second derivatives + the normalised Frobenius norm.

    2D -> keys hxx, hxy, hyy; 3D -> hxx, hxy, hxz, hyy, hyz, hzz
    (axis 0 = 'x' in the reference's naming).  The Frobenius norm is
    normalised by the max |component| for numerical stability, matching
    ``filtering.py:555-562``.
    """
    ndim = image.ndim
    spacing = tuple(float(s) for s in spacing)
    if ndim == 2:
        g0 = gradient(image, spacing[0], 0)
        g1 = gradient(image, spacing[1], 1)
        h = {
            "hxx": gradient(g0, spacing[0], 0),
            "hxy": gradient(g0, spacing[1], 1),
            "hyy": gradient(g1, spacing[1], 1),
        }
        frob_sq = h["hxx"] ** 2 + h["hyy"] ** 2 + 2.0 * h["hxy"] ** 2
    elif ndim == 3:
        g0 = gradient(image, spacing[0], 0)
        g1 = gradient(image, spacing[1], 1)
        g2 = gradient(image, spacing[2], 2)
        h = {
            "hxx": gradient(g0, spacing[0], 0),
            "hxy": gradient(g0, spacing[1], 1),
            "hxz": gradient(g0, spacing[2], 2),
            "hyy": gradient(g1, spacing[1], 1),
            "hyz": gradient(g1, spacing[2], 2),
            "hzz": gradient(g2, spacing[2], 2),
        }
        frob_sq = (
            h["hxx"] ** 2
            + h["hyy"] ** 2
            + h["hzz"] ** 2
            + 2.0 * (h["hxy"] ** 2 + h["hxz"] ** 2 + h["hyz"] ** 2)
        )
    else:
        raise ValueError(f"Unsupported number of dimensions: {ndim}")

    max_abs = jnp.zeros((), image.dtype)
    for comp in h.values():
        max_abs = jnp.maximum(max_abs, jnp.max(jnp.abs(comp)))
    max_abs = jnp.where(max_abs > 0, max_abs, 1.0)
    frobenius_norm = jnp.sqrt(frob_sq) / max_abs
    return h, frobenius_norm
