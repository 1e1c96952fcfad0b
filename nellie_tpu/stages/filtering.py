"""Stage 1 — Filter: multi-scale Frangi vesselness preprocessing.

TPU-native rebuild of the reference ``Filter``
(``/root/reference/nellie/segmentation/filtering.py:17-1076``), same
constructor surface and artifact contract (float32 ``im_preprocessed``),
but the per-frame compute is one fused jitted kernel
(:func:`nellie_tpu.kernels.frangi.vesselness_frame`) instead of a
numpy/cupy scale loop with masked gather/eigh/scatter.

Scaling story:
* whole frame fits HBM -> single fused kernel call per timepoint
* low-memory / OOM      -> halo-padded spatial chunking on host (halo =
  ceil(truncate·σ_max), reference ``filtering.py:318-323``)
* multi-chip            -> ``nellie_tpu.mesh`` shards Z/Y/X with
  ppermute halo exchange (same math, same kernel body)
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from nellie_tpu.io.verifier import ImInfo
from nellie_tpu.kernels import frangi as frangi_k
from nellie_tpu.utils import adaptive_run
from nellie_tpu.utils.base_logger import logger
from nellie_tpu.utils.chunking import (
    compute_chunk_shape,
    crop_core as _crop_core,
    iter_uniform_windows,
    uniform_window_shapes,
)


def _shift_bool(mask, axis, o):
    out = np.zeros_like(mask)
    src = [slice(None)] * mask.ndim
    dst = [slice(None)] * mask.ndim
    if o > 0:
        src[axis] = slice(o, None)
        dst[axis] = slice(None, -o)
    else:
        src[axis] = slice(None, o)
        dst[axis] = slice(-o, None)
    out[tuple(dst)] = mask[tuple(src)]
    return out


def _binary_opening_host(mask):
    """numpy mirror of kernels.filters.binary_opening (cross structure,
    border erodes) for frames that never fit on device."""
    er = mask.copy()
    for axis in range(mask.ndim):
        for o in (1, -1):
            er &= _shift_bool(mask, axis, o)
    dil = er.copy()
    for axis in range(mask.ndim):
        for o in (1, -1):
            dil |= _shift_bool(er, axis, o)
    return dil


def _finalize_host(frangi: np.ndarray, max_samples: int) -> np.ndarray:
    """Host mirror of frangi_k.finalize_frame (percentile-1 mask + binary
    opening, ``filtering.py:952-967``) — the chunked path keeps the
    assembled frame on host, so finalizing here avoids re-uploading the
    whole volume over the (slow) host<->device link."""
    if frangi.sum() <= 0:
        return frangi
    from nellie_tpu.kernels.thresholds import sample_strides

    strides = sample_strides(frangi.shape, max_samples)
    sample = frangi[tuple(slice(None, None, s) for s in strides)]
    pos_vals = sample[sample > 0]
    if pos_vals.size == 0:
        return frangi
    thr = np.percentile(pos_vals.astype(np.float64), 1.0)
    mask = frangi > thr
    mask = _binary_opening_host(mask)
    return frangi * mask


def _remove_edges_host(frangi: np.ndarray) -> np.ndarray:
    """Host mirror of frangi_k.remove_edges_frame (15-row margin per
    Z-slice nonzero bbox, ``filtering.py:969-1000``)."""
    x = frangi if frangi.ndim == 3 else frangi[None]
    out = x.copy()
    for z in range(x.shape[0]):
        rows = np.nonzero((x[z] != 0).any(axis=1))[0]
        if rows.size == 0:
            continue
        rmin, rmax = rows[0], rows[-1]
        margin = min(15, rmax - rmin + 1)
        out[z, rmin:rmin + margin] = 0
        out[z, rmax - margin + 1:rmax + 1] = 0
    return out if frangi.ndim == 3 else out[0]


class Filter:
    """Multi-scale Frangi-style vesselness filter for 2D/3D(+T) data."""

    def __init__(
        self,
        im_info: ImInfo,
        num_t=None,
        remove_edges: bool = False,
        min_radius_um: float = 0.25,
        max_radius_um: float = 1.0,
        alpha_sq: float = 0.5,
        beta_sq: float = 0.5,
        frob_thresh=None,
        frob_thresh_division=2,
        viewer=None,
        device: str = "auto",
        low_memory: bool = False,
        max_chunk_voxels: int = int(1e6),
        max_threshold_samples: int = int(1e6),
        mesh=None,
        chunk_transfer_dtype=None,
        carry_dtype: str = "float32",
    ):
        self.im_info = im_info
        self.device = device
        # optional jax.sharding.Mesh with a "z" axis: frames are placed
        # with NamedSharding(mesh, P("z")) so GSPMD partitions the jitted
        # Frangi kernel over the leading spatial axis (halo exchange over
        # ICI); results match single-device to float-reassociation
        # tolerance (~1e-6, tested)
        self.mesh = mesh
        self.truncate = 3.0
        if not self.im_info.no_z:
            z_res = self.im_info.dim_res.get("Z") or self.im_info.dim_res.get("X") or 1.0
            x_res = self.im_info.dim_res.get("X") or 1.0
            self.z_ratio = float(z_res) / float(x_res)
        else:
            self.z_ratio = 1.0
        self.num_t = num_t
        if num_t is None and not self.im_info.no_t:
            self.num_t = im_info.shape[im_info.axes.index("T")]
        self.remove_edges = remove_edges
        self.min_radius_um = min_radius_um
        self.max_radius_um = max_radius_um

        self.min_radius_px = self.min_radius_um / self.im_info.dim_res["X"]
        self.max_radius_px = self.max_radius_um / self.im_info.dim_res["X"]

        self.im_memmap = None
        self.frangi_memmap = None

        self.sigmas = None
        self.alpha_sq = float(alpha_sq)
        self.beta_sq = float(beta_sq)
        self.frob_thresh = frob_thresh
        self.frob_thresh_division = frob_thresh_division
        self.viewer = viewer

        self.low_memory = low_memory
        self.max_chunk_voxels = int(max_chunk_voxels)
        self.max_threshold_samples = int(max_threshold_samples)
        # optional narrower device->host dtype for the chunked path
        # (e.g. "float16" halves the pull bytes on bandwidth-limited
        # links at ~1e-3 relative cost; the disk artifact stays float32)
        self.chunk_transfer_dtype = chunk_transfer_dtype
        # storage dtype for the cascade's scan carries / conv
        # intermediates ("float16" halves the kernel's HBM traffic;
        # math stays float32 — see FrangiParams.carry_dtype)
        self.carry_dtype = str(carry_dtype)
        self.halo = None

    # -- setup ---------------------------------------------------------------
    def _get_t(self):
        if self.num_t is None:
            if self.im_info.no_t:
                self.num_t = 1
            else:
                self.num_t = self.im_info.shape[self.im_info.axes.index("T")]

    def _allocate_memory(self):
        logger.debug("Allocating memory for frangi filter.")
        self.im_memmap = self.im_info.get_memmap(self.im_info.im_path)
        self.shape = self.im_memmap.shape
        im_frangi_path = self.im_info.pipeline_paths["im_preprocessed"]
        self.frangi_memmap = self.im_info.allocate_memory(
            im_frangi_path, dtype="float", description="frangi filtered im",
            return_memmap=True,
        )

    def _get_spacing(self, ndim):
        if ndim == 2:
            y = self.im_info.dim_res.get("Y") or 1.0
            x = self.im_info.dim_res.get("X") or 1.0
            return (float(y), float(x))
        z = self.im_info.dim_res.get("Z") or self.im_info.dim_res.get("X") or 1.0
        y = self.im_info.dim_res.get("Y") or 1.0
        x = self.im_info.dim_res.get("X") or 1.0
        return (float(z), float(y), float(x))

    def _set_default_sigmas(self):
        """Radius range -> σ ladder: σ ∈ [min_r/2, max_r/3], ≤5 scales,
        step ≥ 0.2 (reference ``filtering.py:288-316``)."""
        min_sigma_step_size = 0.2
        num_sigma = 5

        sigma_1 = self.min_radius_px / 2.0
        sigma_2 = self.max_radius_px / 3.0
        self.sigma_min = min(sigma_1, sigma_2)
        self.sigma_max = max(sigma_1, sigma_2)
        if self.sigma_max <= self.sigma_min:
            self.sigma_max = self.sigma_min + min_sigma_step_size

        step = max(min_sigma_step_size, (self.sigma_max - self.sigma_min) / float(num_sigma))
        self.sigmas = sorted(np.arange(self.sigma_min, self.sigma_max, step, dtype=float).tolist())
        ndim = 2 if self.im_info.no_z else 3
        self._params = frangi_k.FrangiParams(
            sigmas=tuple(self.sigmas),
            spacing=self._get_spacing(ndim),
            z_ratio=self.z_ratio,
            alpha_sq=self.alpha_sq,
            beta_sq=self.beta_sq,
            frob_thresh=None if self.frob_thresh is None else float(self.frob_thresh),
            frob_thresh_division=float(self.frob_thresh_division or 0.0),
            max_threshold_samples=self.max_threshold_samples,
            truncate=self.truncate,
            carry_dtype=self.carry_dtype,
        )
        self.halo = self._compute_halo()
        logger.debug("Sigmas = %s", self.sigmas)

    def _compute_halo(self):
        if not self.sigmas:
            return None
        sigma_vec = self._params.sigma_vec(max(self.sigmas))
        return tuple(int(np.ceil(self.truncate * float(s))) for s in sigma_vec)

    # -- per-frame -----------------------------------------------------------
    def _frame_device(self):
        if adaptive_run.normalize_device(self._active_device) == "cpu":
            return jax.devices("cpu")[0]
        return jax.devices()[0]

    def _frame_placement(self, shape=None):
        """Single device, or a NamedSharding over self.mesh (the §2.4 SP
        analog: one spatial axis sharded over the mesh's "z" axis).

        The sharded axis is the first one divisible by the mesh extent
        (Z first, then Y/X); if none divides, the frame is replicated —
        still correct, just unsharded."""
        if self.mesh is not None:
            from nellie_tpu.mesh.sharded import frame_sharding
            return frame_sharding(self.mesh, shape)
        return self._frame_device()

    def _run_frame(self, t, mask=True):
        logger.info(f"Running Frangi filter on t={t}.")
        frame_cpu = np.asarray(self.im_memmap[t, ...])
        if self._active_low_memory:
            return self._run_frame_chunked(frame_cpu, mask=mask)
        # upload in the raw dtype (uint16 halves tunnel traffic); the
        # kernel casts to float32 on device
        frame = jax.device_put(
            np.ascontiguousarray(frame_cpu), self._frame_placement(frame_cpu.shape))
        vessel, masks = frangi_k.vesselness_frame(frame, self._params, apply_mask=mask)
        if self.im_info.no_z:
            blob = frangi_k.log_blobness_2d(frame, masks, self._params)
            vessel = jnp.maximum(vessel, jnp.maximum(blob, 0.0))
        if self.remove_edges:
            vessel = frangi_k.remove_edges_frame(vessel)
        return vessel

    def _run_frame_chunked(self, frame_cpu, mask=True, max_chunk_voxels=None):
        """Halo-padded spatial chunking for frames too large for HBM
        (reference ``filtering.py:855-908``), pipelined:

        * every window has ONE static extended shape (uniform shifted
          windows), so the whole frame runs under a single XLA program —
          the round-1 ragged edges recompiled per shape and cost ~17x
        * the core is cropped on device (traced-offset dynamic_slice) so
          only core voxels cross PCIe back
        * chunk t+1's upload+compute dispatches before chunk t's result is
          pulled, overlapping host<->device transfer with TPU compute
        """
        shape = frame_cpu.shape
        chunk_voxels = int(max_chunk_voxels or self.max_chunk_voxels or int(np.prod(shape)))
        halo = self.halo or (0,) * len(shape)
        dev = self._frame_device()

        while True:
            try:
                chunk_shape = compute_chunk_shape(shape, chunk_voxels)
                core_shape, _ = uniform_window_shapes(shape, chunk_shape, halo)
                vessel_out = np.zeros(shape, dtype=np.float32)
                pending = None
                for owned, ext, offset, local in iter_uniform_windows(
                        shape, chunk_shape, halo):
                    # raw-dtype upload (uint16 halves tunnel traffic)
                    chunk = jax.device_put(np.ascontiguousarray(frame_cpu[ext]), dev)
                    v, m = frangi_k.vesselness_frame(chunk, self._params, apply_mask=mask)
                    v_core = _crop_core(v, jnp.asarray(offset, jnp.int32), core_shape)
                    if self.chunk_transfer_dtype is not None:
                        v_core = v_core.astype(self.chunk_transfer_dtype)
                    if pending is not None:
                        vessel_out[pending[0]] = np.asarray(
                            pending[1], np.float32)[pending[2]]
                    pending = (owned, v_core, local)
                if pending is not None:
                    vessel_out[pending[0]] = np.asarray(
                        pending[1], np.float32)[pending[2]]
                # stay on host: finalize/remove_edges run in numpy, so the
                # assembled frame never re-crosses the host<->device link
                if self.remove_edges:
                    vessel_out = _remove_edges_host(vessel_out)
                return vessel_out
            except Exception as exc:
                if not adaptive_run.is_oom_error(exc):
                    raise
                if chunk_voxels <= 1:
                    raise
                chunk_voxels = max(1, chunk_voxels // 2)

    # -- top level -----------------------------------------------------------
    def _write_frame(self, t, frame_dev):
        filtered_im = np.asarray(frame_dev, dtype=np.float32)
        if self.im_info.no_t or self.num_t == 1:
            self.frangi_memmap[:] = (
                filtered_im[None] if self.frangi_memmap.ndim == filtered_im.ndim + 1
                else filtered_im)
        else:
            self.frangi_memmap[t, ...] = filtered_im
        self.frangi_memmap.flush()

    def _mesh_t_batch(self):
        """Frames per step when the driver feeds the mesh's 't' axis."""
        if self.mesh is None or self._active_low_memory:
            return 1
        return int(self.mesh.shape.get("t", 1))

    def _run_filter_batched(self, tb, mask=True):
        """Data-parallel frames over the mesh 't' axis (+ spatial 'z'
        sharding): groups of tb frames run as one sharded program —
        the reference's strictly-sequential per-T loop
        (``filtering.py:1005-1031``) becomes mesh-parallel."""
        from nellie_tpu.mesh.sharded import batch_sharding, batched_filter_kernel

        frame_shape = self.im_memmap.shape[1:] if not self.im_info.no_t else self.im_memmap.shape
        sharding = batch_sharding(self.mesh, frame_shape)
        pending = None
        for start in range(0, self.num_t, tb):
            ts = list(range(start, min(start + tb, self.num_t)))
            if self.viewer is not None:
                self.viewer.status = f"Preprocessing. Frames: {ts[0] + 1}-{ts[-1] + 1} of {self.num_t}."
            frames = np.stack([np.asarray(self.im_memmap[t]) for t in ts])
            if len(ts) < tb:  # pad the final group (extras discarded)
                frames = np.concatenate(
                    [frames, np.repeat(frames[-1:], tb - len(ts), axis=0)])
            batch = jax.device_put(np.ascontiguousarray(frames), sharding)
            out = batched_filter_kernel(
                batch, self._params, mask, self.max_threshold_samples,
                self.remove_edges)
            if pending is not None:
                for i, t in enumerate(pending[0]):
                    self._write_frame(t, pending[1][i])
            pending = (ts, out)
        if pending is not None:
            for i, t in enumerate(pending[0]):
                self._write_frame(t, pending[1][i])

    def _warm_stage_programs(self):
        """Compile finalize/remove-edges concurrently with the first
        frame's vesselness compile (they are separate XLA programs that
        the frame loop would otherwise compile serially — finalize alone
        measured ~19 s on the remote compile server)."""
        import threading

        # canonical artifacts are always T-first (even when no_t: T == 1)
        frame_shape = self.shape[1:]

        def work():
            try:
                z = jnp.zeros(frame_shape, jnp.float32)
                frangi_k.finalize_frame(z, self.max_threshold_samples)
                if self.remove_edges:
                    frangi_k.remove_edges_frame(z)
            except Exception:  # noqa: BLE001 — warming is best-effort
                pass

        self._warm_thread = threading.Thread(
            target=work, name="nellie-filter-warm", daemon=True)
        self._warm_thread.start()

    def _run_filter(self, mask=True):
        tb = self._mesh_t_batch()
        if tb > 1 and self.num_t > 1:
            return self._run_filter_batched(tb, mask=mask)
        if not self._active_low_memory and adaptive_run.normalize_device(
                self._active_device) != "cpu":
            self._warm_stage_programs()
        # double-buffered: frame t+1's compute is dispatched before frame
        # t's result is pulled to host/disk (async JAX dispatch overlaps them)
        pending = None
        for t in range(self.num_t):
            if self.viewer is not None:
                self.viewer.status = f"Preprocessing. Frame: {t + 1} of {self.num_t}."
            frangi_frame = self._run_frame(t, mask=mask)
            if isinstance(frangi_frame, np.ndarray):
                frangi_frame = _finalize_host(frangi_frame, self.max_threshold_samples)
            else:
                frangi_frame = frangi_k.finalize_frame(frangi_frame, self.max_threshold_samples)
            if pending is not None:
                self._write_frame(*pending)
            pending = (t, frangi_frame)
        if pending is not None:
            self._write_frame(*pending)
        warm = getattr(self, "_warm_thread", None)
        if warm is not None:
            # bounded join: a daemon thread killed mid-device-call at
            # interpreter exit aborts the runtime noisily
            warm.join(timeout=30.0)

    def run(self, mask=True):
        logger.info("Running Frangi filter.")

        def attempt(dev, low):
            self._active_device = dev
            self._active_low_memory = low
            self._get_t()
            self._allocate_memory()
            self._set_default_sigmas()
            self._run_filter(mask=mask)

        adaptive_run.run_with_ladder("Filter", self.device, self.low_memory, self.im_info, attempt)
