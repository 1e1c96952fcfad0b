"""Closed-form symmetric 2x2 / 3x3 eigensolvers, elementwise over volumes.

The reference computes Hessian eigenvalues by gathering masked voxels
into an (N, 3, 3) stack and calling ``xp.linalg.eigvalsh`` with OOM
bisection fallbacks (``filtering.py:574-649``).  LAPACK-style
iterative eigensolvers are a poor fit for the TPU VPU; instead the
eigenvalues of a symmetric 3x3 matrix have a closed form (Cardano /
trigonometric method, e.g. Smith 1961), which evaluates as ~30
elementwise VPU ops per voxel with no gather/scatter — so we compute it
*densely* and let the vesselness mask select afterwards.

Eigenvalues are returned sorted by |λ| ascending, matching the
reference's ordering contract (``filtering.py:582-584``).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_TWO_PI_3 = 2.0943951023931953  # 2π/3


def eigvalsh2(hxx, hxy, hyy) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigenvalues of [[hxx, hxy], [hxy, hyy]], sorted by |λ| ascending.

    Mirrors the reference's closed-form 2D path (``filtering.py:676-690``).
    """
    trace = hxx + hyy
    diff = hxx - hyy
    delta = jnp.sqrt(diff * diff + 4.0 * hxy * hxy)
    l1 = 0.5 * (trace - delta)
    l2 = 0.5 * (trace + delta)
    swap = jnp.abs(l1) > jnp.abs(l2)
    eig1 = jnp.where(swap, l2, l1)
    eig2 = jnp.where(swap, l1, l2)
    return eig1, eig2


def eigvalsh3(hxx, hxy, hxz, hyy, hyz, hzz) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Eigenvalues of the symmetric 3x3 with rows [[hxx,hxy,hxz],[hxy,hyy,hyz],
    [hxz,hyz,hzz]], elementwise over any shape, sorted by |λ| ascending."""
    # scale for numerical stability in float32
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(hxx), jnp.abs(hyy)), jnp.maximum(jnp.abs(hzz), jnp.abs(hxy))),
        jnp.maximum(jnp.abs(hxz), jnp.abs(hyz)),
    )
    s = jnp.where(scale > 0, 1.0 / scale, 1.0)
    a, b, c = hxx * s, hyy * s, hzz * s
    d, e, f = hxy * s, hxz * s, hyz * s  # off-diagonals: xy, xz, yz

    q = (a + b + c) / 3.0
    p1 = d * d + e * e + f * f
    p2 = (a - q) ** 2 + (b - q) ** 2 + (c - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)
    p_safe = jnp.where(p > 0, p, 1.0)

    # B = (A - qI) / p
    b00, b11, b22 = (a - q) / p_safe, (b - q) / p_safe, (c - q) / p_safe
    b01, b02, b12 = d / p_safe, e / p_safe, f / p_safe
    det_b = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e1 = q + 2.0 * p * jnp.cos(phi)               # largest
    e3 = q + 2.0 * p * jnp.cos(phi + _TWO_PI_3)   # smallest
    e2 = 3.0 * q - e1 - e3

    degenerate = p == 0
    e1 = jnp.where(degenerate, q, e1)
    e2 = jnp.where(degenerate, q, e2)
    e3 = jnp.where(degenerate, q, e3)

    # undo scaling
    inv_s = jnp.where(scale > 0, scale, 1.0)
    e1, e2, e3 = e1 * inv_s, e2 * inv_s, e3 * inv_s

    # sort by |λ| ascending with a 3-element sorting network
    l1, l2, l3 = e3, e2, e1  # algebraic ascending

    def _swap_if(cond, x, y):
        return jnp.where(cond, y, x), jnp.where(cond, x, y)

    c12 = jnp.abs(l1) > jnp.abs(l2)
    l1, l2 = _swap_if(c12, l1, l2)
    c23 = jnp.abs(l2) > jnp.abs(l3)
    l2, l3 = _swap_if(c23, l2, l3)
    c12b = jnp.abs(l1) > jnp.abs(l2)
    l1, l2 = _swap_if(c12b, l1, l2)
    return l1, l2, l3
