"""Stage 4 — Markers: motion-capture marker detection.

TPU-native rebuild of the reference ``Markers``
(``/root/reference/nellie/segmentation/mocap_marking.py``): per frame,

  distance  <- EDT of the object mask in *pixel* units, clamped to
               2·max_radius_px (mocap_marking.py:419-448) — here via the
               jump-flood transform
  border    <- dilation(mask) XOR mask (outside shell)
  peaks     <- multi-scale scale-normalised LoG (−σ²∇²G) on the distance
               (or Frangi) image, streamed over scales with best-response
               cross-scale NMS (mocap_marking.py:452-509)
  markers   <- intensity-scored morphological NMS: keep peaks equal to the
               max-filtered intensity score in a (2·d+1) window
               (mocap_marking.py:569-606)

Everything is dense (peak *masks*, not coordinate lists), so the whole
frame is one jitted kernel with no data-dependent shapes.  The distance
clamp bounds the information radius, so the low-memory path chunks with
halo = LoG-halo + NMS-halo + clamp-radius and reproduces the full-frame
result (the reference's key chunking invariant,
``tests/test_mocap_marking.py:35-60``).

Always runs, even for single-timepoint data — distance/border feed
feature extraction (reference ``mocap_marking.py:789``).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from nellie_tpu.io.verifier import ImInfo
from nellie_tpu.kernels import edt
from nellie_tpu.kernels.filters import binary_dilation, gaussian_laplace, maximum_filter
from nellie_tpu.utils import adaptive_run, transfer
from nellie_tpu.utils.base_logger import logger


@jax.jit
def _sparse_bundle(marker, distance, border):
    """One program for the frame's foreground-sparse pull preps
    (marker/border are 0/1 masks: packed bits only)."""
    return (transfer.sparse_prep(marker, values=False),
            transfer.sparse_prep(distance),
            transfer.sparse_prep(border, values=False))
from nellie_tpu.utils.chunking import (
    compute_chunk_shape,
    crop_core,
    iter_uniform_windows,
    uniform_window_shapes,
)


@dataclass(frozen=True)
class MarkerParams:
    sigmas: Tuple[float, ...]
    z_ratio: float
    max_radius_px: float
    peak_min_distance: int
    truncate: float = 4.0
    no_z: bool = True

    def sigma_vec(self, sigma: float):
        if self.no_z:
            return (float(sigma), float(sigma))
        return (float(sigma) / self.z_ratio, float(sigma), float(sigma))


def _clamped_distance(mask, params: MarkerParams):
    clamp_px = int(params.max_radius_px * 2.0) + 1
    distance = edt.distance_transform(mask, max_radius_px=clamp_px)  # pixel units
    return jnp.minimum(distance, params.max_radius_px * 2.0).astype(jnp.float32)


@partial(jax.jit, static_argnames=("params",))
def markers_frame(intensity, mask, base_im, params: MarkerParams, distance=None):
    """One frame: (marker uint8, distance float32, border uint8).

    ``base_im`` is the peak-detection image; ``distance`` may carry a
    precomputed clamped distance map (markers_frame_distance passes its
    own so the EDT runs once, not twice).
    """
    mask = mask.astype(bool)
    if distance is None:
        distance = _clamped_distance(mask, params)
    border = binary_dilation(mask, connectivity=1) ^ mask

    use_im = base_im
    valid = mask & (distance > 0)

    best_resp = jnp.zeros(mask.shape, jnp.float32)
    peak_mask = jnp.zeros(mask.shape, bool)
    for s in params.sigmas:
        vec = params.sigma_vec(float(s))
        log_resp = -gaussian_laplace(use_im.astype(jnp.float32), vec) * (float(s) ** 2)
        log_resp = jnp.maximum(log_resp, 0.0)
        local_max = log_resp == maximum_filter(log_resp, 3)
        local_max = local_max & valid
        better = local_max & (log_resp > best_resp)
        peak_mask = peak_mask | better
        best_resp = jnp.where(better, log_resp, best_resp)

    # intensity-scored morphological NMS
    score = jnp.where(peak_mask, intensity.astype(jnp.float32), 0.0)
    size = 2 * int(params.peak_min_distance) + 1
    max_filtered = maximum_filter(score, size)
    keep = (score == max_filtered) & (score > 0)

    return keep.astype(jnp.uint8), distance, border.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("params",))
def markers_frame_distance(intensity, mask, params: MarkerParams):
    """use_im='distance' variant: peak detection runs on the distance map
    (computed ONCE and shared with the artifact output)."""
    mask = mask.astype(bool)
    distance = _clamped_distance(mask, params)
    return markers_frame(intensity, mask, distance, params, distance=distance)


class Markers:
    """Mocap marker / distance / border generation."""

    def __init__(self, im_info: ImInfo, num_t=None,
                 min_radius_um=0.20, max_radius_um=1, use_im="distance", num_sigma=5,
                 viewer=None, prefer_gpu=True, peak_min_distance=2,
                 device="auto", low_memory=False, max_chunk_voxels=int(1e6)):
        self.im_info = im_info
        self.num_t = num_t
        if self.im_info.no_t:
            self.num_t = 1
        elif num_t is None:
            self.num_t = im_info.shape[im_info.axes.index("T")]

        if self.im_info.no_z:
            self.z_ratio = 1.0
        else:
            self.z_ratio = self.im_info.dim_res["Z"] / self.im_info.dim_res["X"]

        self.min_radius_um = max(min_radius_um, self.im_info.dim_res["X"])
        self.max_radius_um = max_radius_um
        self.min_radius_px = self.min_radius_um / self.im_info.dim_res["X"]
        self.max_radius_px = self.max_radius_um / self.im_info.dim_res["X"]
        self.use_im = use_im
        self.num_sigma = num_sigma
        self.peak_min_distance = int(peak_min_distance)
        self.truncate = 4.0
        self.device = device
        self.low_memory = low_memory
        self.max_chunk_voxels = int(max_chunk_voxels)
        self.viewer = viewer

        self.shape = ()
        self.sigmas = None
        self.im_memmap = None
        self.im_frangi_memmap = None
        self.label_memmap = None
        self.im_marker_memmap = None
        self.im_distance_memmap = None
        self.im_border_memmap = None

    # -- setup ---------------------------------------------------------------
    def _set_default_sigmas(self):
        """σ ∈ [min_r/2, max_r/3], ≥0.2 step (``mocap_marking.py:329-363``)."""
        min_step = 0.2
        self.sigma_min = self.min_radius_px / 2.0
        self.sigma_max = self.max_radius_px / 3.0
        sigma_range = self.sigma_max - self.sigma_min
        if sigma_range <= 0:
            self.sigmas = [self.sigma_min]
        else:
            step = max(min_step, sigma_range / max(self.num_sigma, 1))
            self.sigmas = list(np.arange(self.sigma_min, self.sigma_max, step))
            if not self.sigmas:
                self.sigmas = [self.sigma_min]
        self._params = MarkerParams(
            sigmas=tuple(float(s) for s in self.sigmas),
            z_ratio=self.z_ratio,
            max_radius_px=float(self.max_radius_px),
            peak_min_distance=self.peak_min_distance,
            truncate=self.truncate,
            no_z=self.im_info.no_z,
        )

    def _get_t(self):
        if self.num_t is None:
            self.num_t = 1 if self.im_info.no_t else self.im_info.shape[self.im_info.axes.index("T")]

    def _allocate_memory(self):
        logger.debug("Allocating memory for mocap marking.")
        self.label_memmap = self.im_info.get_memmap(self.im_info.pipeline_paths["im_instance_label"])
        self.im_memmap = self.im_info.get_memmap(self.im_info.im_path)
        self.shape = self.label_memmap.shape
        if self.use_im == "frangi":
            self.im_frangi_memmap = self.im_info.get_memmap(self.im_info.pipeline_paths["im_preprocessed"])
        else:
            self.im_frangi_memmap = None

        self.im_marker_memmap = self.im_info.allocate_memory(
            self.im_info.pipeline_paths["im_marker"], dtype="uint8",
            description="mocap marker image", return_memmap=True)
        self.im_distance_memmap = self.im_info.allocate_memory(
            self.im_info.pipeline_paths["im_distance"], dtype="float32",
            description="distance transform image", return_memmap=True)
        self.im_border_memmap = self.im_info.allocate_memory(
            self.im_info.pipeline_paths["im_border"], dtype="uint8",
            description="border image", return_memmap=True)

    # -- halos (for the chunked path) -----------------------------------------
    def _chunk_halo(self):
        sigma_max = float(max(self.sigmas))
        log_h = int(np.ceil(self.truncate * sigma_max))
        if not self.im_info.no_z:
            log_hz = int(np.ceil(self.truncate * sigma_max / max(self.z_ratio, 1e-6)))
        nms_h = self.peak_min_distance
        dist_h = int(np.ceil(self.max_radius_px * 2.0))
        h_xy = max(log_h, 1) + nms_h + dist_h
        if self.im_info.no_z:
            return (h_xy, h_xy)
        h_z = max(log_hz, 1) + nms_h + dist_h
        return (h_z, h_xy, h_xy)

    # -- per-frame -----------------------------------------------------------
    def _run_frame(self, t, low_memory=False, chunk_voxels=None):
        logger.info(f"Running motion capture marking, volume {t}/{self.num_t - 1}")
        intensity = np.ascontiguousarray(self.im_memmap[t])
        mask = np.ascontiguousarray(self.label_memmap[t]) > 0

        if not mask.any():
            zero = np.zeros_like(mask, dtype=np.uint8)
            return zero, np.zeros(mask.shape, np.float32), zero

        if low_memory:
            return self._run_frame_chunked(t, intensity, mask, chunk_voxels)

        if self.use_im == "frangi":
            base = jnp.asarray(np.ascontiguousarray(self.im_frangi_memmap[t]), jnp.float32)
            marker, distance, border = markers_frame(
                jnp.asarray(intensity), jnp.asarray(mask), base, self._params)
        else:
            marker, distance, border = markers_frame_distance(
                jnp.asarray(intensity), jnp.asarray(mask), self._params)
        # lazy foreground-sparse pulls: the frame loop overlaps them with
        # the next frame's dispatch, and marker/border move as bit-packed
        # masks (they are 0/1)
        return _sparse_bundle(marker, distance, border)

    def _run_frame_chunked(self, t, intensity, mask, chunk_voxels=None):
        """Uniform-shape halo windows (one XLA program per frame) with the
        next chunk dispatched before the previous result is pulled."""
        shape = mask.shape
        chunk_shape = compute_chunk_shape(shape, chunk_voxels or self.max_chunk_voxels)
        halo = self._chunk_halo()
        core_shape, _ = uniform_window_shapes(shape, chunk_shape, halo)
        marker = np.zeros(shape, np.uint8)
        distance = np.zeros(shape, np.float32)
        border = np.zeros(shape, np.uint8)
        frangi = (
            np.ascontiguousarray(self.im_frangi_memmap[t]) if self.use_im == "frangi" else None
        )
        pending = None
        for owned, ext, offset, local in iter_uniform_windows(shape, chunk_shape, halo):
            m = jnp.asarray(np.ascontiguousarray(mask[ext]))
            i = jnp.asarray(np.ascontiguousarray(intensity[ext]))
            if frangi is not None:
                mk, di, bo = markers_frame(i, m, jnp.asarray(np.ascontiguousarray(frangi[ext]), jnp.float32), self._params)
            else:
                mk, di, bo = markers_frame_distance(i, m, self._params)
            offs = jnp.asarray(offset, jnp.int32)
            cur = (owned, crop_core(mk, offs, core_shape),
                   crop_core(di, offs, core_shape), crop_core(bo, offs, core_shape),
                   local)
            if pending is not None:
                marker[pending[0]] = np.asarray(pending[1])[pending[4]]
                distance[pending[0]] = np.asarray(pending[2])[pending[4]]
                border[pending[0]] = np.asarray(pending[3])[pending[4]]
            pending = cur
        if pending is not None:
            marker[pending[0]] = np.asarray(pending[1])[pending[4]]
            distance[pending[0]] = np.asarray(pending[2])[pending[4]]
            border[pending[0]] = np.asarray(pending[3])[pending[4]]
        return marker, distance, border

    def _frame_shape(self):
        ndim = 2 if self.im_info.no_z else 3
        return self.im_marker_memmap.shape[-ndim:]

    # -- main loop -----------------------------------------------------------
    def _write_frame(self, t, marker_dev, distance_dev, border_dev):
        shape = self._frame_shape()
        marker = transfer.finish_sparse(marker_dev, shape, np.uint8)
        distance = transfer.finish_sparse(distance_dev, shape, np.float32)
        border = transfer.finish_sparse(border_dev, shape, np.uint8)
        if self.im_info.no_t or self.num_t == 1:
            self.im_marker_memmap[:] = marker[None] if self.im_marker_memmap.ndim == marker.ndim + 1 else marker
            self.im_distance_memmap[:] = distance[None] if self.im_distance_memmap.ndim == distance.ndim + 1 else distance
            self.im_border_memmap[:] = border[None] if self.im_border_memmap.ndim == border.ndim + 1 else border
        else:
            self.im_marker_memmap[t] = marker
            self.im_distance_memmap[t] = distance
            self.im_border_memmap[t] = border
        self.im_marker_memmap.flush()
        self.im_distance_memmap.flush()
        self.im_border_memmap.flush()

    def _run_mocap_marking(self):
        # frame t+1's kernels dispatch before frame t's results are pulled
        pending = None
        for t in range(self.num_t):
            if self.viewer is not None:
                self.viewer.status = f"Running mocap marking. Frame: {t + 1} of {self.num_t}."
            devs = self._run_frame(t, low_memory=self.low_memory)
            if pending is not None:
                self._write_frame(pending[0], *pending[1])
            pending = (t, devs)
        if pending is not None:
            self._write_frame(pending[0], *pending[1])

    def run(self):
        """Always runs — distance/border feed feature extraction even
        without a time dimension (``mocap_marking.py:789``)."""
        def attempt(dev, low):
            self.low_memory = low
            self._get_t()
            self._allocate_memory()
            self._set_default_sigmas()
            self._run_mocap_marking()

        adaptive_run.run_with_ladder("Markers", self.device, self.low_memory, self.im_info, attempt)
