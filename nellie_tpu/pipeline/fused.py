"""Device-resident fused segmentation: Filter -> Label -> Network -> Markers.

The reference pipeline moves every intermediate through disk between
stages (``/root/reference/nellie/run.py:56-115``): each stage memmaps its
inputs back from the previous stage's artifact.  On a bandwidth-limited
host<->device link that handoff dominates end-to-end time — round-2
profiling measured 5-8x transfer/dispatch overhead over kernel time for
Label/Network/Markers.

Here stages 1-4 run as ONE per-frame device pipeline:

* the raw frame is uploaded once (uint16 — half the float32 bytes)
* vesselness, instance labels, skeleton and marker images stay in HBM
  across stage boundaries — zero re-uploads
* disk artifacts are still written (identical paths/dtypes, so artifact
  existence resume and per-stage re-run keep working), but the pulls are
  dispatched with the producing kernels and written to disk behind the
  NEXT frame's compute (write-behind)
* label images cross the link as uint16 when the label count fits
  (:mod:`nellie_tpu.utils.transfer`)

The per-stage kernels are the SAME jitted programs the standalone stage
classes run (``stages/filtering.py``, ``labelling.py``, ``networking.py``,
``mocap_marking.py``), so the artifacts are bit-identical to the classic
per-stage path (tested in ``tests/test_fused.py``) and the compile warmer
benefits both paths.

With ``mesh=`` the single frame upload is placed with a
``NamedSharding`` over the mesh's spatial axis and every downstream
kernel (Frangi, CC, thinning, JFA, LoG/NMS) is GSPMD-partitioned — this
is how ``run(..., mesh=)`` shards four of the seven stages (SURVEY §2.4).
"""
from __future__ import annotations

import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from nellie_tpu.kernels import frangi as frangi_k
from nellie_tpu.stages.filtering import Filter
from nellie_tpu.stages.labelling import (
    Label,
    _frangi_threshold_kernel,
    _intensity_otsu_kernel,
    _label_frame_kernel,
)
from nellie_tpu.stages.mocap_marking import Markers, markers_frame, markers_frame_distance
from nellie_tpu.stages.networking import (
    Network,
    _add_missing_skeleton_kernel,
    _branch_skel_labels_kernel,
    _clean_skeleton_kernel,
    _pixel_class_kernel,
    _relabel_objects_kernel,
)
from nellie_tpu.kernels.skeleton import skeletonize_2d, skeletonize_3d
from nellie_tpu.utils import transfer
from nellie_tpu.utils.base_logger import logger


# One frame's eight artifact pulls ride a SINGLE uint8 blob (one device
# program, one device->host round trip — the tunnel costs ~20 ms per
# pull).  Support containment does the heavy lifting: skeleton values
# are branch labels masked to skel>0 within the instance mask, pixel
# classes live on skeleton voxels, markers are NMS peaks inside the
# mask, and the clamped EDT is positive exactly on the mask — so ONE
# bit-packed support (labels>0, OR'd with pixel_class for safety)
# carries six members gathered at the same compacted positions (a
# superset support is lossless — zeros scatter as zeros).  Label-valued
# members cross the link as uint16 (their device-side maxima ride a tail
# word; host falls back to the dense pull on the rare >65535 frame).
#   group L (labels>0|pc!=0): labels u16, branch u16, skel u16,
#                             pixel_class u8, marker u8, distance f32
#   group F (frangi>0):       frangi f32 (denser support: own, wider cap)
#   border:                   0/1 mask, packed bits only
#   tail:                     int32 maxima [labels, branch, skel]
_BLOB_L_MEMBERS = ("labels", "branch", "skel", "pixel_class", "marker",
                   "distance")
_BLOB_U16 = frozenset(("labels", "branch", "skel"))
_BLOB_L_CAP_DIV = 32   # 3.1% fg capacity; measured group max 1.6%
_BLOB_F_CAP_DIV = 16   # finalized vesselness support is denser

# single-device frame-group batching: total voxels per one-dispatch group
# (caps the vmapped chain's live intermediates — ~8 f32 full-volume
# buffers in the Frangi cascade plus the CCL fixpoint state — well under
# one chip's HBM; 16 Mvox ≈ 0.6 GB of f32 working set per buffer class)
_BATCH_GROUP_VOX = int(16e6)
# process-level compiled-program cache: a warm run() in the same process
# (new FusedSegmentation instance, identical params — bench.py's
# cold+warm e2e) reuses the compiled chain instead of recompiling
_BATCH_PROG_CACHE: dict = {}


def _u8(a):
    """Flat little-endian byte view of any array (blob concatenation)."""
    if a.dtype == jnp.uint8:
        return a.reshape(-1)
    return jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)


def _blob_member_dev(arrs, k):
    v = arrs[k].reshape(-1)
    if k in _BLOB_U16:
        return v.astype(jnp.uint16)
    if k == "marker":
        return v.astype(jnp.uint8)
    return v


def _blob_member_width(k, dense_dtype):
    if k in _BLOB_U16:
        return 2, np.uint16
    if k == "marker":
        return 1, np.uint8
    return np.dtype(dense_dtype).itemsize, dense_dtype


@jax.jit
def _sparse_pull_bundle(arrs):
    size = int(np.prod(arrs["labels"].shape))
    if size < transfer.MIN_COMPRESS_ELEMS or size % 8:
        return {"dense": arrs}
    pieces = []
    fg = (arrs["labels"].reshape(-1) != 0) | (arrs["pixel_class"].reshape(-1) != 0)
    cap_l = size // _BLOB_L_CAP_DIV
    pieces.append(transfer.packbits(fg))
    idx = jnp.flatnonzero(fg, size=cap_l, fill_value=size - 1)
    pieces.extend(_u8(_blob_member_dev(arrs, k)[idx]) for k in _BLOB_L_MEMBERS)

    ffg = arrs["frangi"].reshape(-1) != 0
    cap_f = size // _BLOB_F_CAP_DIV
    pieces.append(transfer.packbits(ffg))
    fidx = jnp.flatnonzero(ffg, size=cap_f, fill_value=size - 1)
    pieces.append(_u8(arrs["frangi"].reshape(-1)[fidx]))

    pieces.append(transfer.packbits(arrs["border"].reshape(-1) != 0))
    tail = jnp.stack([jnp.max(arrs[k]).astype(jnp.int32)
                      for k in ("labels", "branch", "skel")])
    pieces.append(_u8(tail))
    return {"blob": jnp.concatenate(pieces), "dense": arrs}


def _finish_blob(pulls, shape, key, out_dtype):
    """Slice one artifact out of the blob pull (layout mirrors
    :func:`_sparse_pull_bundle`); dense fallback on support-capacity or
    uint16 overflow."""
    if "blob" not in pulls:
        return np.asarray(pulls["dense"][key], out_dtype)
    blob = pulls["_blob_host"]
    size = int(np.prod(shape))
    cap_l = size // _BLOB_L_CAP_DIV
    cap_f = size // _BLOB_F_CAP_DIV
    widths = [_blob_member_width(k, pulls["dense"][k].dtype)[0]
              for k in _BLOB_L_MEMBERS]
    f_off = size // 8 + cap_l * sum(widths)
    b_off = f_off + size // 8 + cap_f * 4
    tail_at = b_off + size // 8
    maxima = dict(zip(("labels", "branch", "skel"),
                      np.frombuffer(blob[tail_at:tail_at + 12].tobytes(),
                                    np.int32).tolist()))

    def scatter(bits_at, cap, voff, k):
        bits = np.unpackbits(blob[bits_at:bits_at + size // 8],
                             bitorder="little")
        idx = np.flatnonzero(bits)
        if len(idx) > cap:  # support overflow: dense fallback
            return np.asarray(pulls["dense"][k], out_dtype)
        width, wire_dtype = _blob_member_width(k, pulls["dense"][k].dtype)
        vals = np.frombuffer(blob[voff:voff + cap * width].tobytes(),
                             dtype=wire_dtype)[: len(idx)]
        out = np.zeros(size, out_dtype)
        out[idx] = vals.astype(out_dtype, copy=False)
        return out.reshape(shape)

    if key in _BLOB_L_MEMBERS:
        if key in _BLOB_U16 and maxima[key] >= (1 << 16):
            return np.asarray(pulls["dense"][key], out_dtype)
        voff = size // 8
        for k, w in zip(_BLOB_L_MEMBERS, widths):
            if k == key:
                return scatter(0, cap_l, voff, key)
            voff += cap_l * w
    if key == "frangi":
        return scatter(f_off, cap_f, f_off + size // 8, "frangi")
    if key == "border":
        bits = np.unpackbits(blob[b_off:b_off + size // 8], bitorder="little")
        return bits.reshape(shape).astype(out_dtype, copy=False)
    raise KeyError(key)


class FusedSegmentation:
    """Run stages 1-4 with device-resident handoff.

    Constructs the four stage objects (their constructors own all
    configuration parity with the reference), allocates their artifacts,
    then drives one fused frame loop instead of four sequential stage
    loops.
    """

    def __init__(
        self,
        im_info,
        remove_edges: bool = False,
        otsu_thresh_intensity: bool = False,
        threshold=None,
        device: str = "auto",
        mesh=None,
        viewer=None,
        cache_frames: bool = False,
        batch_frames="auto",
        filter_kwargs=None,
        label_kwargs=None,
        network_kwargs=None,
        markers_kwargs=None,
    ):
        self.im_info = im_info
        self.device = device
        self.mesh = mesh
        self.viewer = viewer
        # "auto" (accelerator backends only) | True | False — see
        # _batch_group; NELLIE_FUSED_BATCH ∈ {0,1} overrides at run time
        self.batch_frames = batch_frames
        # leave per-frame device arrays (raw/frangi/distance) alive in
        # HBM for downstream stages in the same process — bypasses the
        # ~50 MB/frame re-upload HuMomentTracking would otherwise pay
        # (utils/device_cache.py); budget-bounded, artifacts unchanged
        self.cache_frames = cache_frames

        def merge(extra, **base):
            # per-stage config kwargs (plugin.config trees) win over the
            # convenience args; the fused loop is whole-frame by design,
            # so low_memory (a classic-ladder concern) is dropped here
            kw = dict(base)
            kw.update(extra or {})
            kw.pop("low_memory", None)
            return kw

        self.filter = Filter(im_info, mesh=mesh, **merge(
            filter_kwargs, remove_edges=remove_edges, device=device))
        self.label = Label(im_info, mesh=mesh, **merge(
            label_kwargs, otsu_thresh_intensity=otsu_thresh_intensity,
            threshold=threshold, device=device))
        self.network = Network(im_info, **merge(network_kwargs, device=device))
        self.markers = Markers(im_info, **merge(markers_kwargs, device=device))
        self.stage_times = {}

    # -- setup -----------------------------------------------------------
    def _setup(self):
        f = self.filter
        f._active_device = self.device
        f._active_low_memory = False
        f._get_t()
        f._allocate_memory()
        f._set_default_sigmas()

        lb = self.label
        lb._set_low_memory(False)
        lb._get_t()
        lb._allocate_memory()

        nw = self.network
        nw._get_t()
        nw._allocate_memory()

        mk = self.markers
        mk._get_t()
        mk._allocate_memory()
        mk._set_default_sigmas()

        self.num_t = f.num_t

    def _placement(self, shape):
        if self.mesh is not None:
            from nellie_tpu.mesh.sharded import frame_sharding
            return frame_sharding(self.mesh, shape)
        return self.filter._frame_device()

    # -- per-frame device programs ---------------------------------------
    def _frame_filter(self, raw_dev):
        """Filter: vesselness + finalize (``filtering.py:806-1000``)."""
        f = self.filter
        vessel, masks = frangi_k.vesselness_frame(raw_dev, f._params, apply_mask=True)
        if self.im_info.no_z:
            blob = frangi_k.log_blobness_2d(raw_dev, masks, f._params)
            vessel = jnp.maximum(vessel, jnp.maximum(blob, 0.0))
        if f.remove_edges:
            vessel = frangi_k.remove_edges_frame(vessel)
        return frangi_k.finalize_frame(vessel, f.max_threshold_samples)

    def _frame_label(self, raw_dev, frangi_dev):
        """Label: device-resident thresholds + instance segmentation.

        Same math as ``Label._compute_frame_thresholds`` +
        ``_label_frame_kernel`` (reference ``labelling.py:440-532``), but
        the strided threshold sample is taken from the DEVICE frangi
        array — the host-side memmap sample never happens.  The "no valid
        values -> all-zero labels" host gate becomes a device select
        (threshold = +inf when the sample is empty).
        """
        lb = self.label
        step = lb._sample_step(int(np.prod(frangi_dev.shape)))
        frangi_flat = frangi_dev.reshape(-1)
        use_intensity = lb.otsu_thresh_intensity or lb.threshold is not None

        orig_flat = None
        intensity_thresh = jnp.float32(0.0)
        if lb.otsu_thresh_intensity:
            orig_flat = raw_dev.reshape(-1).astype(jnp.float32)
            it, it_ok = _intensity_otsu_kernel(orig_flat, lb.histogram_nbins, step)
            intensity_thresh = jnp.where(it_ok, it, jnp.float32(0.0))
        elif lb.threshold is not None:
            orig_flat = raw_dev.reshape(-1).astype(jnp.float32)
            intensity_thresh = jnp.float32(lb.threshold)

        # full flats + static step: the stride becomes a fused iota mask
        # inside the kernels — no eager strided gather (a TPU relayout)
        thr, ok = _frangi_threshold_kernel(
            frangi_flat, orig_flat, intensity_thresh, lb.histogram_nbins, step)
        frangi_thresh = jnp.where(ok, thr, jnp.float32(jnp.inf))

        return _label_frame_kernel(
            frangi_dev,
            raw_dev.astype(jnp.float32),
            intensity_thresh,
            frangi_thresh,
            lb.min_area_pixels,
            not self.im_info.no_z,
            use_intensity,
        )

    def _frame_network(self, labels_dev, frangi_dev):
        """Network: thinning -> clean -> fill-missing -> classify ->
        branch CC -> object relabel (``networking.py:828-902``)."""
        nw = self.network
        mask = labels_dev > 0
        skel_mask = skeletonize_2d(mask) if self.im_info.no_z else skeletonize_3d(mask)
        skel = jnp.where(skel_mask, labels_dev, 0)
        skel = _clean_skeleton_kernel(skel)
        skel = _add_missing_skeleton_kernel(skel, labels_dev, frangi_dev)
        skel = jnp.where(skel > 0, labels_dev, 0)
        pixel_class = _pixel_class_kernel(skel)
        branch_skel_labels = _branch_skel_labels_kernel(pixel_class)
        branch_labels = _relabel_objects_kernel(branch_skel_labels, labels_dev, nw.scaling)
        return (jnp.where(skel > 0, branch_skel_labels, 0), pixel_class, branch_labels)

    def _frame_markers(self, raw_dev, labels_dev, frangi_dev):
        """Markers: EDT distance/border + LoG peaks (``mocap_marking.py``)."""
        mk = self.markers
        mask = labels_dev > 0
        if mk.use_im == "frangi":
            return markers_frame(raw_dev, mask, frangi_dev, mk._params)
        return markers_frame_distance(raw_dev, mask, mk._params)

    # -- frame loop ------------------------------------------------------
    def _upload_frame(self, t, placement):
        """Frame t's raw memmap read + device upload (prefetchable: the
        loop runs this for frame t+1 on a worker thread while frame t's
        programs dispatch — SURVEY §5.8(v)'s double-buffered device_put;
        the reference's analog is the synchronous per-frame memmap read,
        ``/root/reference/nellie/run.py:56-115``)."""
        raw_host = np.ascontiguousarray(self.filter.im_memmap[t])
        return jax.device_put(raw_host, placement)

    def _dispatch_frame(self, t, placement, raw_dev=None):
        if raw_dev is None:
            raw_dev = self._upload_frame(t, placement)
        times = {}

        def staged(name, fn, *args):
            t0 = time.perf_counter()
            out = fn(*args)
            if self._fence:
                jax.block_until_ready(out)
                # the tunnelled backend's block_until_ready is not a
                # reliable fence; force a scalar materialisation
                leaf = jax.tree_util.tree_leaves(out)[0]
                np.asarray(jnp.max(leaf))
            times[name] = time.perf_counter() - t0
            return out

        frangi_dev = staged("filter", self._frame_filter, raw_dev)
        labels_dev = staged("label", self._frame_label, raw_dev, frangi_dev)
        skel, pixel_class, branch_labels = staged(
            "network", self._frame_network, labels_dev, frangi_dev)
        marker, distance, border = staged(
            "markers", self._frame_markers, raw_dev, labels_dev, frangi_dev)

        if self.cache_frames and self.mesh is None:
            from nellie_tpu.utils.device_cache import frame_cache
            cache = frame_cache(self.im_info, create=True)
            cache.put("im", t, raw_dev)
            cache.put("im_preprocessed", t, frangi_dev)
            cache.put("im_distance", t, distance)
            # Hierarchy's branch-geometry stencil reads the full skeleton
            # volume — cached here it never re-crosses the link
            # (16.8 MB/frame at bench size)
            cache.put("im_skel", t, skel)

        # foreground-sparse device->host copies (shared bit-packed
        # support masks + compacted values, ~9x fewer link bytes at
        # measured <2% fg density) as ONE program and ONE blob pull
        pulls = _sparse_pull_bundle(
            {"frangi": frangi_dev, "labels": labels_dev, "skel": skel,
             "pixel_class": pixel_class, "branch": branch_labels,
             "distance": distance, "marker": marker, "border": border})
        return pulls, times

    def _write_frame(self, t, pulls):
        shape = self.filter.im_memmap.shape[1:]
        if "blob" in pulls and "_blob_host" not in pulls:
            pulls["_blob_host"] = np.asarray(pulls["blob"])  # the ONE pull

        def dense(key, dtype):
            return _finish_blob(pulls, shape, key, dtype)

        self.filter._write_frame(t, dense("frangi", np.float32))
        self.label.instance_label_memmap[t, ...] = dense("labels", np.int32)
        self.label.instance_label_memmap.flush()
        self.network._write_frame(
            t, dense("skel", np.int32), dense("pixel_class", np.uint8),
            dense("branch", np.uint32))
        self.markers._write_frame(
            t, dense("marker", np.uint8), dense("distance", np.float32),
            dense("border", np.uint8))

    # -- sharded whole-batch execution (multi-chip production path) -------
    def _run_batch_mesh(self):
        """All frames as ONE sharded program over the mesh: the stencil-
        heavy Filter+Label phase runs (t, z)-sharded (GSPMD halo
        exchange + all-reduced thresholds), the iterative fixpoint
        stages (thinning, JFA, NMS) reshard to frame-parallel P('t'),
        executing the SAME per-frame programs as the sequential fused
        loop, so artifacts are identical to single-device ``run()``
        (validated by the driver's ``dryrun_multichip`` and
        ``tests/test_mesh.py``)."""
        import jax.sharding as jsh
        from jax import lax
        from nellie_tpu.mesh.sharded import batch_sharding

        mesh = self.mesh
        t_frames = self.num_t
        batch = np.ascontiguousarray(self.filter.im_memmap[:t_frames])
        # the t axis must divide evenly across the mesh's t extent — pad
        # with zero frames (they segment to empty and are discarded)
        t_extent = int(mesh.shape.get("t", 1))
        pad_t = (-t_frames) % t_extent
        if pad_t:
            batch = np.concatenate(
                [batch, np.zeros((pad_t,) + batch.shape[1:], batch.dtype)])
        in_sharding = batch_sharding(mesh, batch.shape[1:])
        t_only = jsh.NamedSharding(mesh, jsh.PartitionSpec("t"))

        def prog(b):
            b = lax.with_sharding_constraint(b, in_sharding)
            frangi = jax.vmap(self._frame_filter)(b)
            labels = jax.vmap(self._frame_label)(b, frangi)
            b_t = lax.with_sharding_constraint(b, t_only)
            frangi_t = lax.with_sharding_constraint(frangi, t_only)
            labels_t = lax.with_sharding_constraint(labels, t_only)
            skel, pixel_class, branch = jax.vmap(self._frame_network)(
                labels_t, frangi_t)
            marker, distance, border = jax.vmap(self._frame_markers)(
                b_t, labels_t, frangi_t)
            return jax.vmap(_sparse_pull_bundle)(
                {"frangi": frangi_t, "labels": labels_t, "skel": skel,
                 "pixel_class": pixel_class, "branch": branch,
                 "distance": distance, "marker": marker, "border": border})

        logger.info("Fused segmentation (sharded batch): %d frames over "
                    "mesh %s", t_frames,
                    dict(zip(mesh.axis_names, mesh.devices.shape)))
        t0 = time.perf_counter()
        pulls_all = jax.jit(prog)(jax.device_put(batch, in_sharding))
        for t in range(t_frames):
            pulls = {"dense": {k: v[t] for k, v in pulls_all["dense"].items()}}
            if "blob" in pulls_all:
                pulls["blob"] = pulls_all["blob"][t]
            self._write_frame(t, pulls)
        return {"seg_batch": time.perf_counter() - t0}

    # -- single-device frame-group batching --------------------------------
    def _batch_group(self) -> int:
        """Frames per single-dispatch group (1 = the per-frame loop).

        The per-frame loop dispatches ~20 jitted programs per frame; on
        the tunnelled backend each dispatch costs ~20 ms of host time and
        every jit boundary materialises its intermediates to HBM.
        Grouping G frames into ONE vmapped program amortises both.  G is
        capped so the chain's live intermediates stay well inside HBM,
        and the mode stays off on the CPU backend (dispatch is free
        there and the per-frame loop is what the parity suite measures)
        unless forced.  ``NELLIE_FUSED_BATCH`` ∈ {0,1} overrides."""
        import os

        if self.mesh is not None or self.num_t <= 1 or self._fence:
            return 1
        mode = self.batch_frames
        env = os.environ.get("NELLIE_FUSED_BATCH")
        if env is not None:
            mode = {"0": False, "1": True}.get(env, mode)
        if mode is False:
            return 1
        if mode == "auto" and jax.default_backend() == "cpu":
            return 1
        frame_vox = int(np.prod(self.filter.im_memmap.shape[1:]))
        return max(1, min(self.num_t, _BATCH_GROUP_VOX // max(frame_vox, 1)))

    def _chain_shadow(self):
        """A parameters-only stand-in for ``self`` for the cached chain
        closure: the ``_frame_*`` methods read exactly the attributes
        mirrored here (every one also fingerprinted by
        :meth:`_batch_prog_key`), so the process-level program cache
        never pins stage objects, artifact memmaps or the viewer."""
        from types import SimpleNamespace

        tsp = self.label.threshold_sampling_pixels
        return SimpleNamespace(
            im_info=SimpleNamespace(no_z=self.im_info.no_z),
            filter=SimpleNamespace(
                _params=self.filter._params,
                remove_edges=self.filter.remove_edges,
                max_threshold_samples=self.filter.max_threshold_samples),
            label=SimpleNamespace(
                otsu_thresh_intensity=self.label.otsu_thresh_intensity,
                threshold=self.label.threshold,
                histogram_nbins=self.label.histogram_nbins,
                min_area_pixels=self.label.min_area_pixels,
                _sample_step=lambda size: max(int(size) // max(1, tsp), 1)),
            network=SimpleNamespace(scaling=self.network.scaling),
            markers=SimpleNamespace(use_im=self.markers.use_im,
                                    _params=self.markers._params))

    def _batch_prog_key(self, group: int):
        """Hashable fingerprint of everything the stage-1..4 chain reads
        from the stage objects — the process-level program cache reuses a
        compiled chain across FusedSegmentation instances (a warm
        ``run()`` in the same process must not recompile), and any param
        in this key changing forces a fresh compile."""
        f, lb, nw, mk = self.filter, self.label, self.network, self.markers
        frame_shape = tuple(self.filter.im_memmap.shape[1:])
        frame_vox = int(np.prod(frame_shape))
        return (group, frame_shape, str(self.filter.im_memmap.dtype),
                bool(self.im_info.no_z),
                f._params, f.remove_edges, f.max_threshold_samples,
                lb.otsu_thresh_intensity, lb.threshold, lb.histogram_nbins,
                lb.min_area_pixels, lb._sample_step(frame_vox),
                tuple(nw.scaling), mk.use_im, mk._params)

    def _run_batch_single(self, group: int, placement):
        """G frames per ONE device program: the whole stage-1..4 chain
        vmapped over a frame group and jitted as a single XLA program —
        one dispatch and one blob pull per G frames instead of ~20
        dispatches per frame, with XLA free to fuse across the former
        jit boundaries.  Artifacts are identical to the per-frame loop
        (same kernels, same order; ``tests/test_fused.py`` asserts
        bit-parity), and the device frame cache is populated from the
        group outputs so tracking/hierarchy keep their HBM handoff.

        Reference analog: the per-stage memmap loop this entire module
        replaces, ``/root/reference/nellie/run.py:56-115``."""
        import queue as _queue
        from concurrent.futures import ThreadPoolExecutor

        key = self._batch_prog_key(group)
        prog = _BATCH_PROG_CACHE.get(key)
        if prog is None:
            # the cached closure captures a parameters-only stand-in, not
            # self: a cache entry pins ~1 KB of params instead of four
            # stage objects with open artifact memmaps (+ a viewer) for
            # the process lifetime
            shadow = self._chain_shadow()
            fs = FusedSegmentation

            def chain(b):
                frangi = jax.vmap(lambda f: fs._frame_filter(shadow, f))(b)
                labels = jax.vmap(
                    lambda f, v: fs._frame_label(shadow, f, v))(b, frangi)
                skel, pixel_class, branch = jax.vmap(
                    lambda l, v: fs._frame_network(shadow, l, v))(
                    labels, frangi)
                marker, distance, border = jax.vmap(
                    lambda f, l, v: fs._frame_markers(shadow, f, l, v))(
                    b, labels, frangi)
                pulls = jax.vmap(_sparse_pull_bundle)(
                    {"frangi": frangi, "labels": labels, "skel": skel,
                     "pixel_class": pixel_class, "branch": branch,
                     "distance": distance, "marker": marker,
                     "border": border})
                return pulls, frangi, distance, skel

            prog = jax.jit(chain)
            if len(_BATCH_PROG_CACHE) >= 4:
                _BATCH_PROG_CACHE.clear()
            _BATCH_PROG_CACHE[key] = prog

        groups = [list(range(s, min(s + group, self.num_t)))
                  for s in range(0, self.num_t, group)]

        def upload(ts):
            # ragged tail: repeat the last frame so one shape compiles;
            # padded lanes are never written back
            idx = ts + [ts[-1]] * (group - len(ts))
            raw = np.ascontiguousarray(self.filter.im_memmap[idx])
            return jax.device_put(raw, placement)

        q = _queue.Queue(maxsize=2)
        writer_exc = []

        def _drain():
            while True:
                item = q.get()
                if item is None:
                    return
                try:
                    if not writer_exc:
                        ts, pulls_all = item
                        # the whole group's blobs as ONE device->host pull
                        blob_all = (np.asarray(pulls_all["blob"])
                                    if "blob" in pulls_all else None)
                        for i, t in enumerate(ts):
                            pulls = {"dense": {
                                k: v[i] for k, v in pulls_all["dense"].items()}}
                            if blob_all is not None:
                                pulls["blob"] = pulls_all["blob"][i]
                                pulls["_blob_host"] = blob_all[i]
                            self._write_frame(t, pulls)
                except Exception as exc:  # noqa: BLE001 — re-raised below
                    writer_exc.append(exc)
                finally:
                    q.task_done()

        writer = threading.Thread(target=_drain,
                                  name="nellie-fused-writer", daemon=True)
        writer.start()
        uploader = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="nellie-fused-upload")
        cache = None
        if self.cache_frames:
            from nellie_tpu.utils.device_cache import frame_cache
            cache = frame_cache(self.im_info, create=True)

        t0 = time.perf_counter()
        next_fut = None
        try:
            for gi, ts in enumerate(groups):
                if self.viewer is not None:
                    self.viewer.status = (
                        f"Segmenting (fused, batched). Frames: {ts[0] + 1}-"
                        f"{ts[-1] + 1} of {self.num_t}.")
                logger.info("Fused segmentation (batched x%d): frames "
                            "%d-%d/%d", group, ts[0] + 1, ts[-1] + 1,
                            self.num_t)
                raw_dev = next_fut.result() if next_fut else upload(ts)
                if gi + 1 < len(groups):
                    next_fut = uploader.submit(upload, groups[gi + 1])
                pulls_all, frangi_b, distance_b, skel_b = prog(raw_dev)
                if cache is not None:
                    for i, t in enumerate(ts):
                        cache.put("im", t, raw_dev[i])
                        cache.put("im_preprocessed", t, frangi_b[i])
                        cache.put("im_distance", t, distance_b[i])
                        cache.put("im_skel", t, skel_b[i])
                if writer_exc:
                    break
                q.put((ts, pulls_all))
        finally:
            q.put(None)
            writer.join()
            uploader.shutdown(wait=True)
        if writer_exc:
            raise writer_exc[0]
        return {"seg_batch_single": time.perf_counter() - t0}

    def run(self, fence_stages: bool = False):
        """Returns a per-stage device-time dict when ``fence_stages``
        (diagnostic; fencing serialises the pipeline), else {}."""
        self._fence = fence_stages
        self._setup()
        if (self.mesh is not None and self.num_t > 1
                and int(self.mesh.shape.get("t", 1)) > 1):
            self.stage_times = self._run_batch_mesh()
            return self.stage_times
        placement = self._placement(
            self.filter.im_memmap.shape[1:])
        group = self._batch_group()
        if group > 1:
            self.stage_times = self._run_batch_single(group, placement)
            return self.stage_times
        stage_totals = {}
        # a single background writer drains (t, pulls) in frame order: the
        # blob pull's device wait and the memmap writes/flushes (~0.5
        # s/frame profiled) overlap the main thread's dispatch of frame
        # t+1 instead of sitting on the critical path.  maxsize=2 bounds
        # host memory to two frames' pulled blobs.
        import queue as _queue

        q = _queue.Queue(maxsize=2)
        writer_exc = []

        def _drain():
            while True:
                item = q.get()
                if item is None:
                    return
                try:
                    if not writer_exc:
                        self._write_frame(*item)
                except Exception as exc:  # noqa: BLE001 — re-raised below
                    writer_exc.append(exc)
                finally:
                    q.task_done()

        writer = threading.Thread(target=_drain, name="nellie-fused-writer",
                                  daemon=True)
        writer.start()
        # double-buffered upload: frame t+1's memmap read + device_put
        # runs on this worker while frame t's programs dispatch, so the
        # 8.4 MB/frame raw upload rides the link behind compute instead
        # of serialising ahead of it
        from concurrent.futures import ThreadPoolExecutor

        uploader = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="nellie-fused-upload")
        next_raw = None
        try:
            for t in range(self.num_t):
                if self.viewer is not None:
                    self.viewer.status = f"Segmenting (fused). Frame: {t + 1} of {self.num_t}."
                logger.info("Fused segmentation: frame %d/%d", t + 1, self.num_t)
                raw_dev = (next_raw.result() if next_raw is not None
                           else self._upload_frame(t, placement))
                if t + 1 < self.num_t:
                    next_raw = uploader.submit(
                        self._upload_frame, t + 1, placement)
                pulls, times = self._dispatch_frame(t, placement, raw_dev)
                for k, v in times.items():
                    stage_totals[k] = stage_totals.get(k, 0.0) + v
                if writer_exc:
                    break
                q.put((t, pulls))
        finally:
            q.put(None)
            writer.join()
            uploader.shutdown(wait=True)
        if writer_exc:
            raise writer_exc[0]
        self.stage_times = stage_totals
        return stage_totals
