"""Stage 5 — HuMomentTracking: frame-to-frame marker matching.

TPU-native rebuild of the reference ``HuMomentTracking``
(``/root/reference/nellie/tracking/hu_tracking.py``):

* per frame: log-normalised Frangi + dilated distance radii; per marker,
  a zero-padded ROI cube is sliced around the marker (vmapped
  ``dynamic_slice`` on a padded frame, fixed-capacity chunks) and reduced
  to 4 stats features (masked mean/var of intensity + log-Frangi) and
  6 (2D) / 18 (3D orthogonal-projection) log-Hu features — two MXU
  einsums per chunk instead of (N, H, W, 4, 4) broadcast tensors
* matching: distance-gated masked z-scored cost with mutual row/column
  argmin under cutoff 1.0, computed tile-by-tile at exact dense
  semantics (``nellie_tpu.kernels.matching``) — replacing both the dense
  cdist path and the cKDTree sparse path
* output: ``flow_vector_array.npy`` rows [t-1, idx0(y,x | z,y,x),
  vec(…), cost] (``hu_tracking.py:1196-1232``)

No-op for single-timepoint data (``hu_tracking.py:1241``).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from nellie_tpu.io.verifier import ImInfo
from nellie_tpu.kernels import matching, moments
from nellie_tpu.kernels.filters import maximum_filter
from nellie_tpu.utils import adaptive_run
from nellie_tpu.utils.base_logger import logger


N_STATS = 4  # masked mean/var of intensity + of log-Frangi


@dataclass
class _FrameFeatures:
    """Per-frame marker features.

    ``feats_dev`` holds the padded (nb, 4+n_hu) [stats | hu] matrix
    DEVICE-resident (with ``coords_phys_dev``/``valid_dev``) so the
    single-tile matcher never pulls it over the link; the host
    ``stats``/``hu`` views materialise lazily (one bundled pull) only
    for the tiled fallback and the mesh frame-parallel path."""

    coords_voxel: np.ndarray
    coords_phys: np.ndarray
    n: int = 0
    feats_dev: object = None
    coords_phys_dev: object = None
    valid_dev: object = None
    _feats_np: np.ndarray = None

    def _feats(self) -> np.ndarray:
        if self._feats_np is None:
            if self.feats_dev is None:
                self._feats_np = np.zeros((0, N_STATS), np.float32)
            else:
                self._feats_np = np.asarray(self.feats_dev)[: self.n]
        return self._feats_np

    @property
    def stats(self) -> np.ndarray:
        return self._feats()[:, :N_STATS]

    @property
    def hu(self) -> np.ndarray:
        return self._feats()[:, N_STATS:]


@jax.jit
def _gather_kernel(arr, coords):
    """Values of ``arr`` at integer coords — a device gather so only the
    sampled values cross the link, not the whole frame."""
    return arr[tuple(coords[:, d] for d in range(coords.shape[1]))]


@jax.jit
def _prep_frame_kernel(frangi, distance):
    """Log-normalised Frangi + 2x dilated distance (``hu_tracking.py:595-607``)."""
    f = frangi.astype(jnp.float32)
    pos = f > 0
    f = jnp.where(pos, jnp.log10(jnp.where(pos, f, 1.0)), f)
    neg = f < 0
    min_neg = jnp.min(jnp.where(neg, f, jnp.inf))
    f = jnp.where(neg, f - jnp.where(jnp.isfinite(min_neg), min_neg, 0.0), f)
    dil = maximum_filter(distance.astype(jnp.float32), 3) * 2.0
    return f, dil


@partial(jax.jit, static_argnames=("r", "no_z"))
def _roi_features_kernel(intensity_pad, frangi_pad, coords, radii, valid, r, no_z):
    """Stats + log-Hu features for one chunk of markers.

    intensity_pad/frangi_pad: frame padded by r zeros per side.
    coords: (n, d) voxel coords; radii: (n,) dilated-distance radii.
    """
    ndim = coords.shape[1]
    shape = tuple(s - 2 * r for s in intensity_pad.shape)
    rad = jnp.ceil(radii).astype(jnp.int32)
    low = jnp.clip(coords - rad[:, None], 0, jnp.asarray(shape, jnp.int32)[None])
    high = jnp.clip(coords + rad[:, None] + 1, 0, jnp.asarray(shape, jnp.int32)[None])
    extent = high - low  # (n, d)

    def slice_one(frame_pad, lo):
        return jax.lax.dynamic_slice(frame_pad, tuple(lo[i] + r for i in range(ndim)), (r,) * ndim)

    cubes_i = jax.vmap(lambda lo: slice_one(intensity_pad, lo))(low).astype(jnp.float32)
    cubes_f = jax.vmap(lambda lo: slice_one(frangi_pad, lo))(low).astype(jnp.float32)

    # zero beyond each marker's true extent (reference zero-pads,
    # hu_tracking.py:424-471)
    mask = jnp.ones(cubes_i.shape, bool)
    for axis in range(ndim):
        idx = jax.lax.broadcasted_iota(jnp.int32, cubes_i.shape, axis + 1)
        mask = mask & (idx < extent[:, axis].reshape((-1,) + (1,) * ndim))
    mask = mask & valid.reshape((-1,) + (1,) * ndim)
    cubes_i = jnp.where(mask, cubes_i, 0.0)
    cubes_f = jnp.where(mask, cubes_f, 0.0)

    stats = jnp.concatenate(
        [moments.masked_mean_variance(cubes_i), moments.masked_mean_variance(cubes_f)], axis=1
    )
    hu = moments.hu_2d(cubes_i) if no_z else moments.hu_3d(cubes_i)
    return stats, moments.log_hu(hu)


def _next_multiple(n, m):
    return ((n + m - 1) // m) * m


@partial(jax.jit, static_argnames=("r", "no_z", "chunk", "scaling"))
def _frame_features_fused(intensity, frangi, distance, coords, valid,
                          r, no_z, chunk, scaling):
    """ONE device program per frame: prep + radii gather + chunked ROI
    moments + physical coords.

    Replaces the old 8-12 dispatch/pull round trips per frame (prep,
    radii pull -> host pad -> per-chunk kernels -> padded stats/hu
    pulls) with a single dispatch whose outputs stay in HBM for the
    matcher.  ``r`` is a static bound derived from the distance
    artifact's host-side max (the dilated radius can never exceed
    2*max(distance), and a larger cube only adds masked zeros — the
    moment kernels are nonzero-masked and translation-invariant, so the
    values are unchanged).  ``chunk`` bounds the (chunk, r^d) gather
    tensors exactly like the old host-chunked loop, via lax.map.
    """
    frangi_norm, dil = _prep_frame_kernel(frangi, distance)
    ndim = coords.shape[1]
    radii = dil[tuple(coords[:, d] for d in range(ndim))]
    pad = [(r, r)] * ndim
    intensity_pad = jnp.pad(intensity.astype(jnp.float32), pad)
    frangi_pad = jnp.pad(frangi_norm, pad)

    nb = coords.shape[0]
    n_chunks = nb // chunk
    coords_c = coords.reshape(n_chunks, chunk, ndim)
    radii_c = radii.reshape(n_chunks, chunk)
    valid_c = valid.reshape(n_chunks, chunk)

    def one(args):
        c, rad, val = args
        return _roi_features_kernel(intensity_pad, frangi_pad, c, rad, val,
                                    r, no_z)

    stats, hu = jax.lax.map(one, (coords_c, radii_c, valid_c))
    feats = jnp.concatenate(
        [stats.reshape(nb, -1), hu.reshape(nb, -1)], axis=1)
    coords_phys = coords.astype(jnp.float32) * jnp.asarray(scaling, jnp.float32)
    return feats, coords_phys


class HuMomentTracking:
    """Hu-moment + distance cost matching across timepoints."""

    def __init__(self, im_info: ImInfo, num_t=None,
                 max_distance_um=1.0,
                 viewer=None,
                 device: str = "auto",
                 mode: str = "auto",
                 max_dense_pairs: int = int(1e7),
                 max_dense_roi_voxels_cpu: int = int(5e7),
                 max_dense_roi_voxels_gpu: int = int(2e7),
                 low_memory: bool = False,
                 roi_chunk: int = 1024,
                 mesh=None):
        self.im_info = im_info
        self.mesh = mesh
        if self.im_info.no_t:
            return

        self.num_t = num_t
        if num_t is None and not self.im_info.no_t:
            self.num_t = im_info.shape[im_info.axes.index("T")]

        if self.im_info.no_z:
            self.scaling = (im_info.dim_res["Y"], im_info.dim_res["X"])
        else:
            self.scaling = (im_info.dim_res["Z"], im_info.dim_res["Y"], im_info.dim_res["X"])

        dt = self.im_info.dim_res.get("T") or 1.0
        if self.im_info.dim_res.get("T") is None:
            logger.warning("Time resolution missing; assuming 1.0s for max_distance_um scaling.")
        self.max_distance_um = max(max_distance_um * dt, 0.5)

        self.shape = ()
        self.viewer = viewer
        self.device = device
        self.mode = mode
        self.low_memory = bool(low_memory)
        self.max_dense_pairs = int(max_dense_pairs)
        self.roi_chunk = int(roi_chunk)

        self.im_memmap = None
        self.im_frangi_memmap = None
        self.im_distance_memmap = None
        self.im_marker_memmap = None
        self.label_memmap = None
        self.flow_vector_array_path = None

    def _get_t(self):
        if self.num_t is None:
            self.num_t = 1 if self.im_info.no_t else self.im_info.shape[self.im_info.axes.index("T")]

    def _allocate_memory(self):
        logger.debug("Allocating memory for Hu-moment tracking.")
        self.label_memmap = self.im_info.get_memmap(self.im_info.pipeline_paths["im_instance_label"])
        self.im_memmap = self.im_info.get_memmap(self.im_info.im_path)
        self.im_frangi_memmap = self.im_info.get_memmap(self.im_info.pipeline_paths["im_preprocessed"])
        self.im_marker_memmap = self.im_info.get_memmap(self.im_info.pipeline_paths["im_marker"])
        self.im_distance_memmap = self.im_info.get_memmap(self.im_info.pipeline_paths["im_distance"])
        self.shape = self.label_memmap.shape
        self.flow_vector_array_path = self.im_info.pipeline_paths["flow_vector_array"]

    # -- per-frame features ---------------------------------------------------
    def _get_frame_features(self, t) -> _FrameFeatures:
        # device-resident handoff: when the fused segmentation loop ran
        # in this process its raw/frangi/distance device arrays are
        # still in HBM (utils/device_cache.py) — skip the ~50 MB/frame
        # re-upload the reference's disk handoff implies
        # (/root/reference/nellie/run.py:56-115)
        cache = None
        if getattr(self, "_use_frame_cache", False):
            from nellie_tpu.utils.device_cache import frame_cache
            cache = frame_cache(self.im_info)
        raw_dev = cache.take("im", t) if cache is not None else None
        frangi_dev = cache.take("im_preprocessed", t) if cache is not None else None
        distance_dev = cache.take("im_distance", t) if cache is not None else None

        marker = np.ascontiguousarray(self.im_marker_memmap[t]) > 0

        dims = 2 if self.im_info.no_z else 3
        coords = np.argwhere(marker)
        n = coords.shape[0]
        if n == 0:
            return _FrameFeatures(
                np.zeros((0, dims), int), np.zeros((0, dims), float), 0)

        # static ROI radius bound from the distance artifact's host max:
        # dilated radii = 2 * maximum_filter(distance) <= 2 * max(distance),
        # and the distance image is clamped (stages/mocap_marking.py:85)
        # so the bound — hence the compiled shape — is stable across
        # frames.  Per-marker radii still gate each cube's true extent
        # on device; the bound only sizes the (masked) slice.
        dmax = float(np.max(np.ascontiguousarray(self.im_distance_memmap[t])))
        max_radius = int(np.ceil(2.0 * dmax)) * 2 + 1
        r = _next_multiple(max(max_radius, 3), 4)

        chunk = self.roi_chunk
        nb = chunk
        while nb < n:
            nb *= 2
        cpad = np.zeros((nb, dims), np.int32)
        cpad[:n] = coords
        val = np.zeros((nb,), bool)
        val[:n] = True

        intensity_src = raw_dev if raw_dev is not None else \
            jnp.asarray(np.ascontiguousarray(self.im_memmap[t]))
        if frangi_dev is None:
            frangi_dev = jnp.asarray(np.ascontiguousarray(self.im_frangi_memmap[t]))
        if distance_dev is None:
            distance_dev = jnp.asarray(np.ascontiguousarray(self.im_distance_memmap[t]))

        valid_dev = jnp.asarray(val)
        feats_dev, coords_phys_dev = _frame_features_fused(
            intensity_src, frangi_dev, distance_dev,
            jnp.asarray(cpad), valid_dev,
            r=r, no_z=self.im_info.no_z, chunk=chunk,
            scaling=tuple(float(s) for s in self.scaling))

        coords_phys = coords * np.asarray(self.scaling, float)
        return _FrameFeatures(
            coords.astype(int), coords_phys, n,
            feats_dev=feats_dev, coords_phys_dev=coords_phys_dev,
            valid_dev=valid_dev)

    # -- matching ---------------------------------------------------------------
    def _match_frames(self, frame_t: _FrameFeatures, frame_prev: _FrameFeatures):
        n_post, n_pre = frame_t.n, frame_prev.n
        if n_post == 0 or n_pre == 0:
            return [], [], []
        # mode maps onto the row-tile size (tiled execution IS the dense
        # semantics at any scale, so 'sparse' just means smaller tiles);
        # 'auto' shrinks tiles when the pair count crosses max_dense_pairs
        if self.mode == "dense":
            tile_rows = max(n_post, 1)
        elif self.mode == "sparse":
            tile_rows = 1024
        else:
            too_big = n_post * n_pre > self.max_dense_pairs
            tile_rows = 2048 if (too_big or self.low_memory) else 8192
        # single-tile fast path over the device-resident features: the
        # padded feats never cross the link, 2 pulls per pair.  The mesh
        # loop colocates each pair's features on one device first
        # (_run_hu_tracking_mesh), so mesh and sequential run the SAME
        # matcher kernel — the host tiled path has equal semantics but
        # not bit-equal f32 reduction order, which shifted z-scored
        # costs by up to ~0.03 (mesh-parity regression, round 4).
        if (frame_t.feats_dev is not None
                and frame_prev.feats_dev is not None
                and n_post <= tile_rows and n_pre <= tile_rows):
            return matching.match_frames_device(
                frame_t.coords_phys_dev, frame_t.feats_dev,
                frame_t.valid_dev, n_post,
                frame_prev.coords_phys_dev, frame_prev.feats_dev,
                frame_prev.valid_dev, n_pre,
                self.max_distance_um, N_STATS)
        return matching.match_frames(
            frame_t.coords_phys, frame_prev.coords_phys,
            frame_t.stats, frame_prev.stats,
            frame_t.hu, frame_prev.hu,
            self.max_distance_um, tile_rows=tile_rows,
        )

    def _pair_rows(self, t, features, prev_features):
        """Flow-vector rows [t-1, idx0, vec, cost] for the (t-1, t) pair
        (reference ``hu_tracking.py:1196-1232``)."""
        rows, cols, costs = self._match_frames(features, prev_features)
        if len(rows) == 0:
            return None
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        costs = np.asarray(costs, np.float32)
        pre_idx = prev_features.coords_voxel[cols]
        cur_idx = features.coords_voxel[rows]
        vecs = cur_idx - pre_idx
        columns = [np.full(len(rows), t - 1, np.int64)]
        columns += [pre_idx[:, d].astype(np.int64) for d in range(pre_idx.shape[1])]
        columns += [vecs[:, d].astype(np.int64) for d in range(vecs.shape[1])]
        columns += [costs]
        return np.column_stack(columns)

    # -- main loop ---------------------------------------------------------------
    def _run_hu_tracking_mesh(self):
        """Frame-parallel tracking over the mesh's devices.

        Per-frame feature extraction is independent across t, and each
        (t-1, t) match depends only on those two frames' features — so
        both phases round-robin frames/pairs over the mesh devices from
        a thread pool (``jax.default_device`` is thread-local).  Output
        rows are assembled in t order: identical to the sequential loop.
        The reference runs frames strictly sequentially
        (``/root/reference/nellie/tracking/hu_tracking.py:1162``).
        """
        import jax as _jax
        from concurrent.futures import ThreadPoolExecutor

        devs = list(self.mesh.devices.flatten())
        feats = [None] * self.num_t

        def features_one(t):
            logger.info(f"Tracking features (mesh) frame {t + 1} of {self.num_t}")
            with _jax.default_device(devs[t % len(devs)]):
                feats[t] = self._get_frame_features(t)

        workers = max(1, min(len(devs), self.num_t))
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(features_one, range(self.num_t)))

        pair_rows = [None] * (self.num_t - 1)

        def match_one(t):
            from dataclasses import replace

            dev = devs[t % len(devs)]
            prev = feats[t - 1]
            if prev is not None and prev.feats_dev is not None:
                # the pair's frames were built on different devices —
                # colocate prev's device features on this pair's device
                # (ICI copy) so the single-tile device matcher runs,
                # bit-identical to the sequential loop
                prev = replace(
                    prev,
                    feats_dev=_jax.device_put(prev.feats_dev, dev),
                    coords_phys_dev=_jax.device_put(prev.coords_phys_dev, dev),
                    valid_dev=_jax.device_put(prev.valid_dev, dev))
            with _jax.default_device(dev):
                pair_rows[t - 1] = self._pair_rows(t, feats[t], prev)

        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(match_one, range(1, self.num_t)))
        return [r for r in pair_rows if r is not None]

    def _run_hu_tracking_sequential(self):
        prev_features = None
        frame_vectors = []
        for t in range(self.num_t):
            if self.viewer is not None:
                self.viewer.status = f"Tracking markers. Frame: {t + 1} of {self.num_t}."
            logger.info(f"Running Hu-moment tracking for frame {t + 1} of {self.num_t}")
            features = self._get_frame_features(t)
            if prev_features is not None:
                rows = self._pair_rows(t, features, prev_features)
                if rows is not None:
                    frame_vectors.append(rows)
            prev_features = features
        return frame_vectors

    def _run_hu_tracking(self):
        if (self.mesh is not None and self.num_t > 2
                and self.mesh.devices.size > 1):
            frame_vectors = self._run_hu_tracking_mesh()
        else:
            frame_vectors = self._run_hu_tracking_sequential()

        if frame_vectors:
            flow_vector_array = np.concatenate(frame_vectors, axis=0)
        else:
            ncols = 6 if self.im_info.no_z else 8
            flow_vector_array = np.empty((0, ncols), np.float32)
        np.save(self.flow_vector_array_path, flow_vector_array)
        logger.debug(f"Saved flow vector array to {self.flow_vector_array_path}")

    def run(self):
        if self.im_info.no_t:
            logger.info("Skipping Hu moment tracking for non-temporal dataset.")
            return

        def attempt(dev, low):
            self.low_memory = low
            # the cached arrays are committed to the accelerator; on the
            # CPU/low-memory ladder rungs fall back to memmap uploads —
            # and under mesh frame-parallelism they would anchor every
            # frame's kernels to the producing device, so skip them there
            self._use_frame_cache = (dev == "accel" and not low
                                     and self.mesh is None)
            if not self._use_frame_cache:
                # nobody else consumes the fused loop's cache: release
                # the pinned HBM (up to the 2.5 GB budget) up front —
                # especially on the low-memory rung, which exists
                # precisely because memory is tight
                from nellie_tpu.utils.device_cache import frame_cache

                cache = frame_cache(self.im_info)
                if cache is not None:
                    cache.clear()
            self._get_t()
            self._allocate_memory()
            self._run_hu_tracking()

        adaptive_run.run_with_ladder(
            "HuMomentTracking", self.device, self.low_memory, self.im_info, attempt)
