"""Stage 2 — Label: threshold + connected-component instance segmentation.

TPU-native rebuild of the reference ``Label``
(``/root/reference/nellie/segmentation/labelling.py:17-778``): per-frame
log-domain min(triangle, Otsu) Frangi threshold (optionally gated by an
intensity Otsu/fixed threshold), 3D hole filling, full-connectivity
connected components, minimum-area filtering, box-mean boundary
smoothing, and final sequential relabelling — all as one jitted kernel
per frame on top of the FastSV union-find (``nellie_tpu.kernels.ccl``).

The chunked-Z path (for volumes too large for HBM) mirrors the
reference's cross-chunk label merging: per-chunk device labelling with a
frame-global offset, boundary-pair extraction, host union-find, and a
final relabel pass (``labelling.py:585-691``).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from nellie_tpu.io.verifier import ImInfo
from nellie_tpu.kernels import ccl
from nellie_tpu.kernels import thresholds as thr_k
from nellie_tpu.kernels.filters import uniform_filter
from nellie_tpu.utils import adaptive_run, transfer
from nellie_tpu.utils.base_logger import logger

_UNSET = object()


# --------------------------------------------------------------------------
# Jitted per-frame kernels
# --------------------------------------------------------------------------

def _stride_valid(flat, step):
    """step > 1: select every step-th element by iota mask instead of a
    strided gather (a relayout on TPU) — same sample set, and the mask
    fuses into the histogram pass (kernels/thresholds.py)."""
    if step <= 1:
        return flat > 0
    pos = jax.lax.iota(jnp.int32, flat.shape[0]) % step == 0
    return pos & (flat > 0)


@partial(jax.jit, static_argnames=("nbins", "step"))
def _frangi_threshold_kernel(frangi_flat, gate_flat, gate_thresh, nbins, step):
    """log10-domain min(triangle, otsu) over sampled positive values,
    optionally gated by ``gate_flat > gate_thresh``
    (reference ``labelling.py:440-455``).  Returns (threshold, any_valid).

    ``step``: stride of the sample within ``frangi_flat`` (1 when the
    caller pre-sampled on host), applied as a fused validity mask."""
    valid = _stride_valid(frangi_flat, step)
    if gate_flat is not None:
        valid = valid & (gate_flat > gate_thresh)
    logv = jnp.log10(jnp.where(frangi_flat > 0, frangi_flat, 1.0))
    tri = thr_k.triangle_threshold(logv, valid, nbins)
    ots, _ = thr_k.otsu_threshold(logv, valid, nbins)
    threshold = jnp.minimum(10.0 ** tri, 10.0 ** ots)
    return threshold, jnp.any(valid)


@partial(jax.jit, static_argnames=("nbins", "step"))
def _intensity_otsu_kernel(frame_flat, nbins, step):
    valid = _stride_valid(frame_flat, step)
    ots, _ = thr_k.otsu_threshold(frame_flat.astype(jnp.float32), valid, nbins)
    return ots, jnp.any(valid)


@partial(jax.jit, static_argnames=("min_area", "fill", "use_intensity"))
def _label_frame_kernel(frangi, original, intensity_thresh, frangi_thresh,
                        min_area, fill, use_intensity):
    """mask -> fill holes -> CC -> area filter -> smooth -> relabel
    (reference ``labelling.py:467-509``)."""
    f = frangi.astype(jnp.float32)
    if use_intensity:
        f = f * (original > intensity_thresh)
    mask = f > frangi_thresh
    if fill:
        mask = ccl.fill_holes(mask)
    mask = ccl.remove_small_components(mask, min_area)
    mask = uniform_filter(mask.astype(jnp.float32), 3) > 0.5
    labels, _ = ccl.label(mask)
    return labels.astype(jnp.int32)


# --------------------------------------------------------------------------
# Stage driver
# --------------------------------------------------------------------------

class Label:
    """Instance segmentation of organelles from the Frangi image."""

    def __init__(self, im_info: ImInfo,
                 num_t=None,
                 threshold=None,
                 otsu_thresh_intensity=False,
                 viewer=None,
                 chunk_z=None,
                 flush_interval=1,
                 min_radius_um=0.25,
                 threshold_sampling_pixels=1_000_000,
                 histogram_nbins=256,
                 device="auto",
                 low_memory: bool = False,
                 max_chunk_voxels: int = int(1e6),
                 mesh=None):
        self.im_info = im_info
        self.device = device
        # optional jax.sharding.Mesh with a "z" axis: frames are placed
        # with NamedSharding(mesh, P("z")) so GSPMD partitions the jitted
        # label kernel (thresholding, hole fill, CC fixpoint) over the
        # leading spatial axis; matches single-device to float-
        # reassociation tolerance (tested)
        self.mesh = mesh
        self.num_t = num_t
        if num_t is None and not self.im_info.no_t:
            self.num_t = im_info.shape[im_info.axes.index("T")]
        self.threshold = threshold
        self.otsu_thresh_intensity = otsu_thresh_intensity

        self.im_memmap = None
        self.frangi_memmap = None
        self.instance_label_memmap = None
        self.shape = ()
        self.viewer = viewer

        self.chunk_z = chunk_z if (not self.im_info.no_z and chunk_z is not None) else None
        self._user_chunk_z = self.chunk_z
        self.flush_interval = max(1, int(flush_interval))
        x_res = self.im_info.dim_res.get("X") or 1.0
        self.min_radius_um = max(float(min_radius_um), float(x_res))
        self.threshold_sampling_pixels = int(threshold_sampling_pixels)
        self.histogram_nbins = int(histogram_nbins)
        self.low_memory = bool(low_memory)
        self.max_chunk_voxels = int(max_chunk_voxels)

        if self.low_memory and self.chunk_z is None and not self.im_info.no_z:
            self.chunk_z = self._infer_chunk_z()

        self.ndim = 2 if self.im_info.no_z else 3
        self.min_area_pixels = self._compute_min_area_pixels()

    # -- configuration ---------------------------------------------------
    def _compute_min_area_pixels(self):
        """min voxels from min radius: πr²/(xy) in 2D, 4/3πr³/(xyz) in 3D
        (reference ``labelling.py:209-219``)."""
        x_res = self.im_info.dim_res.get("X") or 1.0
        y_res = self.im_info.dim_res.get("Y") or x_res
        if self.im_info.no_z:
            area_px = np.pi * self.min_radius_um**2 / (float(x_res) * float(y_res))
            return max(1, int(np.ceil(area_px)))
        z_res = self.im_info.dim_res.get("Z") or x_res
        vol_px = (4.0 / 3.0) * np.pi * self.min_radius_um**3 / (
            float(x_res) * float(y_res) * float(z_res))
        return max(1, int(np.ceil(vol_px)))

    def _infer_chunk_z(self):
        if self.max_chunk_voxels is None or self.max_chunk_voxels <= 0:
            return None
        axes = [ax for ax in self.im_info.axes if ax != "T"]
        shape = [d for ax, d in zip(self.im_info.axes, self.im_info.shape) if ax != "T"]
        if "Z" not in axes:
            return None
        y_dim = int(shape[axes.index("Y")])
        x_dim = int(shape[axes.index("X")])
        if y_dim <= 0 or x_dim <= 0:
            return None
        return max(1, int(self.max_chunk_voxels // (y_dim * x_dim)))

    def _set_low_memory(self, low_memory):
        self.low_memory = bool(low_memory)
        if self.im_info.no_z:
            self.chunk_z = None
            return
        if self._user_chunk_z is not None:
            self.chunk_z = self._user_chunk_z
            return
        self.chunk_z = self._infer_chunk_z() if self.low_memory else None

    def _get_t(self):
        if self.num_t is None:
            self.num_t = 1 if self.im_info.no_t else self.im_info.shape[self.im_info.axes.index("T")]

    def _allocate_memory(self):
        logger.debug("Allocating memory for semantic segmentation.")
        self.im_memmap = self.im_info.get_memmap(self.im_info.im_path)
        self.frangi_memmap = self.im_info.get_memmap(self.im_info.pipeline_paths["im_preprocessed"])
        self.shape = self.frangi_memmap.shape
        self.instance_label_memmap = self.im_info.allocate_memory(
            self.im_info.pipeline_paths["im_instance_label"],
            dtype="int32", description="instance segmentation", return_memmap=True,
        )

    # -- thresholds --------------------------------------------------------
    def _sample_step(self, size):
        return max(int(size) // max(1, self.threshold_sampling_pixels), 1)

    def _compute_frame_thresholds(self, original_view, frangi_view):
        """Per-frame intensity + Frangi thresholds (``labelling.py:511-532``).

        The strided sample is taken host-side from the memmap so only
        <= threshold_sampling_pixels values cross to the device."""
        full = int(np.prod(frangi_view.shape))
        step = self._sample_step(full)
        frangi_sample = jnp.asarray(
            np.ascontiguousarray(np.asarray(frangi_view).reshape(-1)[::step]))

        intensity_thresh = None
        orig_sample = None
        if self.otsu_thresh_intensity or self.threshold is not None:
            orig_sample = jnp.asarray(np.ascontiguousarray(
                np.asarray(original_view).reshape(-1)[::step])).astype(jnp.float32)
        if self.otsu_thresh_intensity:
            thr, ok = _intensity_otsu_kernel(orig_sample, self.histogram_nbins, 1)
            intensity_thresh = float(thr) if bool(ok) else 0.0
        elif self.threshold is not None:
            intensity_thresh = float(self.threshold)

        if intensity_thresh is not None:
            thr, ok = _frangi_threshold_kernel(
                frangi_sample, orig_sample, jnp.float32(intensity_thresh),
                self.histogram_nbins, 1,
            )
        else:
            thr, ok = _frangi_threshold_kernel(
                frangi_sample, None, jnp.float32(0.0), self.histogram_nbins, 1,
            )
        frangi_thresh = float(thr) if bool(ok) else None
        return intensity_thresh, frangi_thresh

    # -- per-frame ----------------------------------------------------------
    def _frame_placement(self, shape):
        """Sharded placement over self.mesh when given, else None
        (default device) — lets GSPMD shard the frame kernel."""
        if self.mesh is None:
            return None
        from nellie_tpu.mesh.sharded import frame_sharding
        return frame_sharding(self.mesh, shape)

    def _label_volume(self, original, frangi, intensity_thresh, frangi_thresh, fill):
        if frangi_thresh is None:
            return np.zeros(frangi.shape, np.int32)
        use_intensity = intensity_thresh is not None
        placement = self._frame_placement(frangi.shape)

        def put(arr):
            a = jnp.asarray(np.ascontiguousarray(arr), dtype=jnp.float32)
            return a if placement is None else jax.device_put(a, placement)

        labels = _label_frame_kernel(
            put(frangi),
            put(original),
            jnp.float32(intensity_thresh if use_intensity else 0.0),
            jnp.float32(frangi_thresh),
            self.min_area_pixels, fill, use_intensity,
        )
        # narrow uint16 pull when the label count fits (halves link bytes)
        return transfer.finish_label_pull(transfer.prep_label_pull(labels), np.int32)

    def _run_frame_full_volume(self, t, original_view, frangi_view, intensity_thresh, frangi_thresh):
        logger.info(f"Running semantic segmentation, volume {t}/{self.num_t - 1}")
        return self._label_volume(
            original_view, frangi_view, intensity_thresh, frangi_thresh,
            fill=not self.im_info.no_z,
        )

    def _run_frame_chunked_z(self, t, original_view, frangi_view, intensity_thresh, frangi_thresh):
        """Chunked-Z with cross-chunk union-find merge (``labelling.py:585-691``)."""
        logger.info(f"Running semantic segmentation in Z-chunks, volume {t}/{self.num_t - 1}")
        if self.im_info.no_z:
            labels = self._run_frame_full_volume(t, original_view, frangi_view,
                                                 intensity_thresh, frangi_thresh)
            self.instance_label_memmap[t, ...] = labels
            return

        z_dim = frangi_view.shape[0]
        chunk = self.chunk_z or z_dim
        chunk = max(1, min(int(chunk), z_dim))

        offset = 0
        parent = {}
        prev_boundary = None
        had_merges = False
        for z_start in range(0, z_dim, chunk):
            z_end = min(z_start + chunk, z_dim)
            ov = original_view[z_start:z_end]
            fv = frangi_view[z_start:z_end]
            ragged = z_end - z_start
            if ragged < chunk:
                # zero-pad the final chunk to the uniform depth so every
                # chunk runs the SAME compiled program (the zero slab is
                # background: border-reachability hole fill and the area
                # filter see it exactly like the array border)
                pad = [(0, chunk - ragged)] + [(0, 0)] * (ov.ndim - 1)
                ov = np.pad(np.asarray(ov), pad)
                fv = np.pad(np.asarray(fv), pad)
            labels_chunk = self._label_volume(
                ov, fv, intensity_thresh, frangi_thresh, fill=True,
            )[:z_end - z_start]
            max_label = int(labels_chunk.max())
            if max_label > 0:
                labels_chunk = labels_chunk.astype(np.int32)
                labels_chunk[labels_chunk > 0] += offset
                offset += max_label

            if prev_boundary is not None and labels_chunk.size > 0:
                curr_boundary = labels_chunk[0]
                both = (prev_boundary > 0) & (curr_boundary > 0)
                if both.any():
                    pairs = np.unique(
                        np.stack([prev_boundary[both], curr_boundary[both]], 1), axis=0
                    )
                    for a, b in pairs:
                        had_merges |= self._uf_union(parent, int(a), int(b))
            prev_boundary = labels_chunk[-1].copy() if labels_chunk.size else None
            self.instance_label_memmap[t, z_start:z_end, ...] = labels_chunk

        if had_merges:
            self._relabel_frame_from_unions(t, z_dim, chunk, parent)

    @staticmethod
    def _uf_find(parent, x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        # path compression
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    def _uf_union(self, parent, a, b):
        ra, rb = self._uf_find(parent, a), self._uf_find(parent, b)
        if ra == rb:
            return False
        lo, hi = min(ra, rb), max(ra, rb)
        parent[hi] = lo
        return True

    def _relabel_frame_from_unions(self, t, z_dim, chunk_z, parent):
        label_map = {0: 0}
        next_label = 1
        for z_start in range(0, z_dim, chunk_z):
            z_end = min(z_start + chunk_z, z_dim)
            labels_chunk = np.asarray(self.instance_label_memmap[t, z_start:z_end, ...])
            unique = np.unique(labels_chunk)
            if unique.size == 1 and unique[0] == 0:
                continue
            roots = np.array([self._uf_find(parent, int(lab)) for lab in unique], labels_chunk.dtype)
            for root in roots:
                root = int(root)
                if root != 0 and root not in label_map:
                    label_map[root] = next_label
                    next_label += 1
            new_ids = np.array([label_map[int(r)] for r in roots], labels_chunk.dtype)
            idx = np.searchsorted(unique, labels_chunk)
            self.instance_label_memmap[t, z_start:z_end, ...] = new_ids[idx]

    # -- main loop ----------------------------------------------------------
    def _run_segmentation_batched(self, tb):
        """Data-parallel frames over the mesh 't' axis: per-frame host
        threshold sampling, then groups of tb frames label as one sharded
        program (replaces the strictly-sequential per-T loop)."""
        from nellie_tpu.mesh.sharded import batch_sharding, batched_label_kernel

        use_intensity = self.otsu_thresh_intensity or self.threshold is not None
        frame_shape = self.frangi_memmap.shape[1:]
        sharding = batch_sharding(self.mesh, frame_shape)
        fill = not self.im_info.no_z
        pending = None
        for start in range(0, self.num_t, tb):
            ts = list(range(start, min(start + tb, self.num_t)))
            if self.viewer is not None:
                self.viewer.status = (
                    f"Extracting organelles. Frames: {ts[0] + 1}-{ts[-1] + 1} of {self.num_t}.")
            it_b, ft_b, valid_b = [], [], []
            for t in ts:
                it, ft = self._compute_frame_thresholds(
                    self.im_memmap[t, ...], self.frangi_memmap[t, ...])
                it_b.append(0.0 if it is None else it)
                ft_b.append(0.0 if ft is None else ft)
                valid_b.append(ft is not None)
            frangi = np.stack([np.asarray(self.frangi_memmap[t]) for t in ts])
            orig = np.stack([np.asarray(self.im_memmap[t]) for t in ts]).astype(np.float32)
            if len(ts) < tb:
                pad = tb - len(ts)
                frangi = np.concatenate([frangi, np.repeat(frangi[-1:], pad, axis=0)])
                orig = np.concatenate([orig, np.repeat(orig[-1:], pad, axis=0)])
                it_b += [0.0] * pad
                ft_b += [0.0] * pad
                valid_b += [False] * pad
            labels = batched_label_kernel(
                jax.device_put(np.ascontiguousarray(frangi), sharding),
                jax.device_put(np.ascontiguousarray(orig), sharding),
                jnp.asarray(it_b, jnp.float32), jnp.asarray(ft_b, jnp.float32),
                jnp.asarray(valid_b),
                self.min_area_pixels, fill, use_intensity)
            if pending is not None:
                for i, t in enumerate(pending[0]):
                    self.instance_label_memmap[t, ...] = np.asarray(pending[1][i])
                self.instance_label_memmap.flush()
            pending = (ts, labels)
        if pending is not None:
            for i, t in enumerate(pending[0]):
                self.instance_label_memmap[t, ...] = np.asarray(pending[1][i])
        self.instance_label_memmap.flush()

    def _run_segmentation(self):
        if (self.mesh is not None and not self.low_memory and self.chunk_z is None
                and int(self.mesh.shape.get("t", 1)) > 1 and self.num_t > 1):
            return self._run_segmentation_batched(int(self.mesh.shape["t"]))
        for t in range(self.num_t):
            if self.viewer is not None:
                self.viewer.status = f"Extracting organelles. Frame: {t + 1} of {self.num_t}."
            original_view = self.im_memmap[t, ...]
            frangi_view = self.frangi_memmap[t, ...]
            intensity_thresh, frangi_thresh = self._compute_frame_thresholds(
                original_view, frangi_view)

            if self.chunk_z is not None and not self.im_info.no_z:
                self._run_frame_chunked_z(t, original_view, frangi_view,
                                          intensity_thresh, frangi_thresh)
            else:
                labels = self._run_frame_full_volume(t, original_view, frangi_view,
                                                     intensity_thresh, frangi_thresh)
                self.instance_label_memmap[t, ...] = labels

            if (t + 1) % self.flush_interval == 0:
                self.instance_label_memmap.flush()
        self.instance_label_memmap.flush()

    def run(self):
        logger.info("Running semantic segmentation.")

        def attempt(dev, low):
            self._set_low_memory(low)
            self._get_t()
            self._allocate_memory()
            self._run_segmentation()

        adaptive_run.run_with_ladder("Label", self.device, self.low_memory, self.im_info, attempt)
