"""Fused multi-scale Frangi vesselness — the pipeline's hottest kernel.

Reimplements the reference's scale-cascaded vesselness
(``/root/reference/nellie/segmentation/filtering.py:806-853``) as one
jittable function per frame:

  for each scale σ (static python floats):
    gauss   <- incremental Gaussian (Δσ = sqrt(σ² − σ_prev²) cascade)
    γ       <- min(triangle, otsu) over positive voxels of gauss
    H, |H|F <- Hessian stencil + normalised Frobenius norm
    mask    <- |H|F > min(triangle, otsu)(|H|F > 0) / division
    λ       <- closed-form symmetric eigensolve (dense, VPU)
    v       <- Frangi response, zeroed for bright-on-dark eigensigns
    out     <- max(out, v * mask);  all_mask &= mask

Where the reference gathers masked voxels into (N,3,3) stacks for LAPACK
(``filtering.py:651-715``), we compute the closed form *densely* and
select with the mask — no data-dependent shapes, everything fuses into a
few HBM passes under XLA.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nellie_tpu.kernels import eigen, filters, thresholds
from nellie_tpu.kernels.hessian import hessian_components

EPS32 = float(np.finfo(np.float32).eps)


@dataclass(frozen=True)
class FrangiParams:
    """Static (trace-time) configuration for the vesselness kernel."""

    sigmas: Tuple[float, ...]
    spacing: Tuple[float, ...]          # physical voxel size per axis
    z_ratio: float = 1.0                # Z σ divisor for anisotropy (3D only)
    alpha_sq: float = 0.5
    beta_sq: float = 0.5
    frob_thresh: Optional[float] = None
    frob_thresh_division: float = 2.0
    max_threshold_samples: int = int(1e6)
    truncate: float = 3.0
    # HBM-traffic knob: storage dtype for the scale-cascade carries (the
    # smoothed volume between scales / between conv passes, and the
    # vesselness accumulator).  "float16" halves the cascade's HBM bytes;
    # all arithmetic (conv accumulation, Hessian, eigensolve, response)
    # stays float32 — only *storage* narrows.  The Frangi response is
    # invariant to uniform input scaling (every threshold is derived from
    # the data itself), so the frame is pre-normalised to ≤1 before
    # narrowing and f16's range is never an issue.  Default float32 keeps
    # the oracle-exact path; opt in via PipelineConfig.filter_carry_dtype.
    carry_dtype: str = "float32"

    def sigma_vec(self, sigma: float) -> Tuple[float, ...]:
        """(Z,Y,X) or (Y,X) anisotropic σ vector (``filtering.py:277-286``)."""
        if len(self.spacing) == 2:
            return (float(sigma), float(sigma))
        return (float(sigma) / self.z_ratio, float(sigma), float(sigma))


def _subsampled_positive(volume: jnp.ndarray, max_samples: int):
    """Deterministic strided downsample + positivity mask (the jit-safe
    analogue of the reference's ``_subsample_for_thresholds``,
    ``filtering.py:348-363``).  For sort-based consumers (percentile);
    histogram consumers use :func:`_stride_masked_positive` instead."""
    strides = thresholds.sample_strides(volume.shape, max_samples)
    sample = thresholds.downsample(volume, strides)
    return sample, sample > 0


def _stride_masked_positive(volume: jnp.ndarray, max_samples: int):
    """Same sample SET as :func:`_subsampled_positive` expressed as a
    full-volume validity mask — no strided gather (a TPU relayout), the
    mask fuses into the histogram pass.  Thresholds are bit-identical."""
    strides = thresholds.sample_strides(volume.shape, max_samples)
    return volume, thresholds.stride_mask(volume.shape, strides) & (volume > 0)


def _gamma(gauss: jnp.ndarray, max_samples: int) -> jnp.ndarray:
    sample, pos = _stride_masked_positive(gauss, max_samples)
    g = thresholds.min_triangle_otsu(sample, pos)
    g = jnp.where(jnp.any(pos), g, EPS32)
    return jnp.maximum(g, EPS32)


def _frob_mask(frob: jnp.ndarray, params: FrangiParams) -> jnp.ndarray:
    if not params.frob_thresh_division:
        return frob > 0
    if params.frob_thresh is not None:
        threshold = jnp.float32(params.frob_thresh)
    else:
        sample, pos = _stride_masked_positive(frob, params.max_threshold_samples)
        threshold = thresholds.min_triangle_otsu(sample, pos)
        threshold = jnp.where(jnp.any(pos), threshold, 0.0)
    return frob > (threshold / params.frob_thresh_division)


def _frangi_response(eigs, gamma_sq, params: FrangiParams):
    """Frangi vesselness from |λ|-sorted eigenvalues (``filtering.py:717-767``)."""
    if len(eigs) == 2:
        l1, l2 = eigs
        rb_sq = (jnp.abs(l1) / (jnp.abs(l2) + 1e-12)) ** 2
        s_sq = l1 * l1 + l2 * l2
        v = jnp.exp(-(rb_sq / params.beta_sq)) * (1.0 - jnp.exp(-(s_sq / gamma_sq)))
        v = jnp.where(l2 > 0, 0.0, v)
    else:
        l1, l2, l3 = eigs
        # NB: the reference uses |λ2| in both ratio numerators
        # (filtering.py:748-749), not the textbook |λ1| for rb.
        ra_sq = (jnp.abs(l2) / (jnp.abs(l3) + 1e-12)) ** 2
        rb_sq = (jnp.abs(l2) / (jnp.sqrt(jnp.abs(l2 * l3)) + 1e-12)) ** 2
        s_sq = l1 * l1 + l2 * l2 + l3 * l3
        v = (
            (1.0 - jnp.exp(-(ra_sq / params.alpha_sq)))
            * jnp.exp(-(rb_sq / params.beta_sq))
            * (1.0 - jnp.exp(-(s_sq / gamma_sq)))
        )
        v = jnp.where((l3 > 0) | (l2 > 0), 0.0, v)
    return jnp.nan_to_num(v, nan=0.0, posinf=0.0, neginf=0.0)


def _delta_kernels(params: FrangiParams, ndim: int):
    """Per-scale incremental Gaussian taps, zero-padded to a shared static
    length per axis so lax.scan can share one compiled body."""
    deltas = []
    prev = 0.0
    for sigma in params.sigmas:
        vp = params.sigma_vec(prev)
        vc = params.sigma_vec(sigma)
        deltas.append(tuple(
            float(np.sqrt(max(0.0, c * c - p * p))) for p, c in zip(vp, vc)))
        prev = sigma
    taps = []
    for axis in range(ndim):
        r_max = max(int(params.truncate * d[axis] + 0.5) for d in deltas)
        t = 2 * r_max + 1
        taps.append(np.stack([
            filters.gaussian_kernel1d_padded(d[axis], t, params.truncate) for d in deltas
        ]).astype(np.float32))
    return taps  # list of (n_scales, taps_axis) arrays


@partial(jax.jit, static_argnames=("params", "apply_mask"))
def vesselness_frame(frame: jnp.ndarray, params: FrangiParams, apply_mask: bool = True):
    """Multi-scale vesselness of one 2D/3D frame.

    Returns (vesselness * accumulated_mask, accumulated_mask) — i.e. the
    product the reference computes at ``filtering.py:925-926``.

    The scale loop is a lax.scan with traced (zero-padded) Gaussian taps:
    one compiled body regardless of the number of scales.

    ``params.carry_dtype="float16"`` narrows the *storage* of the carries
    (smoothed volume, vesselness accumulator) and the between-pass conv
    intermediates; every multiply-accumulate, the Hessian stencil, the
    eigensolve and the response math still run float32 (the upcast fuses
    into each kernel's reads, the downcast into its writes — XLA moves
    half the bytes, computes at full precision).  Scale invariance of the
    response makes the pre-normalisation below exact in real arithmetic.
    """
    frame = frame.astype(jnp.float32)
    cd = jnp.dtype(params.carry_dtype)
    narrow = cd != jnp.dtype(jnp.float32)
    if narrow:
        # keep the carried magnitudes inside f16 range; the response is
        # invariant to this uniform rescale (see docstring)
        frame = frame / jnp.maximum(jnp.max(jnp.abs(frame)), EPS32)
    ndim = frame.ndim
    kernel_stacks = _delta_kernels(params, ndim)
    scan_weights = tuple(jnp.asarray(k) for k in kernel_stacks)

    def scale_body(carry, ws):
        gauss_c, vessel, all_mask = carry
        gauss = gauss_c
        for axis in range(ndim):
            gauss = filters.correlate1d_traced(
                gauss.astype(jnp.float32), ws[axis], axis).astype(cd)
        gauss32 = gauss.astype(jnp.float32)

        gamma = _gamma(gauss32, params.max_threshold_samples)
        gamma_sq = 2.0 * gamma * gamma

        h, frob = hessian_components(gauss32, params.spacing)
        h_mask = _frob_mask(frob, params) if apply_mask else jnp.ones(frame.shape, bool)

        if ndim == 2:
            eigs = eigen.eigvalsh2(h["hxx"], h["hxy"], h["hyy"])
        else:
            eigs = eigen.eigvalsh3(h["hxx"], h["hxy"], h["hxz"], h["hyy"], h["hyz"], h["hzz"])

        v = _frangi_response(eigs, gamma_sq, params)
        v = jnp.where(h_mask, v, 0.0)
        vessel = jnp.maximum(vessel, v.astype(cd))
        all_mask = all_mask & h_mask
        return (gauss, vessel, all_mask), None

    init = (frame.astype(cd), jnp.zeros(frame.shape, cd),
            jnp.ones(frame.shape, dtype=bool))
    (gauss, vessel, all_mask), _ = jax.lax.scan(scale_body, init, scan_weights)
    return vessel.astype(jnp.float32) * all_mask, all_mask


@partial(jax.jit, static_argnames=("params",))
def log_blobness_2d(frame: jnp.ndarray, mask: jnp.ndarray, params: FrangiParams):
    """2D multiscale LoG 'blobness', max-combined and normalised to [0, 0.1]
    (``filtering.py:772-795``, applied only in the 2D path)."""
    frame = frame.astype(jnp.float32)
    lap = None
    for sigma in params.sigmas:
        vec = params.sigma_vec(sigma)
        cur = -filters.gaussian_laplace(frame, vec) * (float(sigma) ** 2)
        cur = cur * mask
        lap = cur if lap is None else jnp.maximum(lap, cur)
    lap = jnp.maximum(lap, 0.0)
    lap_max = jnp.max(lap)
    return lap / (lap_max + 1e-12) / 10.0


def masked_percentile(values: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """Percentile (linear interpolation) of values[mask] with static shapes."""
    flat = values.reshape(-1).astype(jnp.float32)
    m = mask.reshape(-1)
    n_valid = jnp.sum(m)
    big = jnp.float32(jnp.inf)
    s = jnp.sort(jnp.where(m, flat, big))
    pos = (q / 100.0) * jnp.maximum(n_valid - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    val = s[lo] * (1.0 - frac) + s[hi] * frac
    return jnp.where(n_valid > 0, val, 0.0)


@partial(jax.jit, static_argnames=("max_samples",))
def finalize_frame(frangi_frame: jnp.ndarray, max_samples: int = int(1e6)) -> jnp.ndarray:
    """Conditionally apply the percentile-mask refinement: only when the
    frame has signal (``filtering.py:1016-1018``) — one jitted program,
    no host sync."""
    total = jnp.sum(frangi_frame)
    return jax.lax.cond(
        total > 0,
        lambda v: mask_volume_impl(v, max_samples),
        lambda v: v,
        frangi_frame,
    )


def mask_volume_impl(frangi_frame: jnp.ndarray, max_samples: int) -> jnp.ndarray:
    sample, pos = _subsampled_positive(frangi_frame, max_samples)
    thr = masked_percentile(sample, pos, 1.0)
    mask = frangi_frame > thr
    mask = filters.binary_opening(mask)
    out = frangi_frame * mask
    return jnp.where(jnp.any(pos), out, frangi_frame)


@partial(jax.jit, static_argnames=("max_samples",))
def mask_volume(frangi_frame: jnp.ndarray, max_samples: int = int(1e6)) -> jnp.ndarray:
    """Percentile-1 threshold + binary opening refinement
    (``filtering.py:952-967``)."""
    sample, pos = _subsampled_positive(frangi_frame, max_samples)
    thr = masked_percentile(sample, pos, 1.0)
    mask = frangi_frame > thr
    mask = filters.binary_opening(mask)
    out = frangi_frame * mask
    return jnp.where(jnp.any(pos), out, frangi_frame)


@jax.jit
def remove_edges_frame(frangi_frame: jnp.ndarray) -> jnp.ndarray:
    """Zero a 15-row margin at the top/bottom of each (Z-)slice's nonzero
    bounding box (``filtering.py:969-1000``)."""
    ndim = frangi_frame.ndim
    x = frangi_frame
    if ndim == 2:
        x = x[None]
    # x: (Z, Y, X); per-slice row occupancy
    rows_any = jnp.any(x != 0, axis=2)  # (Z, Y)
    ny = x.shape[1]
    row_idx = jnp.arange(ny)[None, :]
    has_any = jnp.any(rows_any, axis=1, keepdims=True)
    rmin = jnp.min(jnp.where(rows_any, row_idx, ny), axis=1, keepdims=True)
    rmax = jnp.max(jnp.where(rows_any, row_idx, -1), axis=1, keepdims=True)
    height = jnp.maximum(rmax - rmin + 1, 0)
    margin = jnp.minimum(15, height)
    kill = (
        ((row_idx >= rmin) & (row_idx < rmin + margin))
        | ((row_idx > rmax - margin) & (row_idx <= rmax))
    ) & has_any
    out = jnp.where(kill[:, :, None], 0.0, x)
    return out[0] if ndim == 2 else out
