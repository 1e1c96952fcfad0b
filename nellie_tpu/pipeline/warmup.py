"""Parallel compile warmer: overlap the seven stages' XLA compilations.

The cold-start cost of the pipeline is the *sum* of per-stage compile
times, because stages run sequentially through the artifact store and
each stage first compiles its kernels when it reaches the front of the
queue (reference behaviour is the same serial ladder,
``/root/reference/nellie/run.py:54-128`` — it just has no compiles).
On TPU the compile server handles concurrent compilations well
(measured ~1.8x for small programs, better for large), so the fix is to
compile *every* later stage's kernels in background threads while the
Filter stage owns the device.

Mechanism: each warm stage gets its own tiny shadow dataset — an
analytic tube phantom with the SAME frame shape as the real run (XLA
programs are keyed by shape, not values) plus shape-true synthetic
versions of every input artifact the stage reads, so the stage's
``run()`` exercises its real call sites end-to-end and populates the
in-process executable cache.  Values are garbage; only shapes, dtypes,
and non-degeneracy (non-empty labels/markers) matter.  Each stage runs
in its own directory, so concurrent warm stages never race on memmaps.

Caveats: stages whose kernel shapes depend on bucketed entity counts
(tracking/reassignment pad marker and voxel counts to capacity buckets)
only pre-compile the smallest bucket; low-memory chunked runs are not
warmed (their chunk shapes are picked at run time).
"""
from __future__ import annotations

import logging
import os
import shutil
import tempfile
import threading

import numpy as np

logger = logging.getLogger(__name__)

# frames in every shadow dataset: 2 covers both the t==0 and t>0 code
# paths of tracking / reassignment / motility
_SHADOW_T = 2

# frame shapes already warmed in this process: compiled programs are
# cached per (shape, static args), so re-running the shadow stages would
# only burn device time alongside the real pipeline
_WARMED_SHAPES: set = set()
# skip warming when a frame exceeds this many voxels: such runs take the
# low-memory chunked paths whose chunk shapes are chosen at run time,
# AND the shadow stages execute real device kernels concurrently with the
# main run — at large frame sizes their HBM footprint could push the
# REAL stage into the adaptive ladder's low-memory fallback
_MAX_WARM_VOXELS = 32 * 1024 * 1024


def _tube_phantom(spatial_shape):
    """Analytic tube phantom: (intensity f32, labels i32, skeleton i32)."""
    if len(spatial_shape) == 2:
        y, x = np.mgrid[0:spatial_shape[0], 0:spatial_shape[1]].astype(np.float32)
        z = None
    else:
        z, y, x = np.mgrid[0:spatial_shape[0], 0:spatial_shape[1],
                           0:spatial_shape[2]].astype(np.float32)
    intensity = np.zeros(spatial_shape, np.float32)
    labels = np.zeros(spatial_shape, np.int32)
    skel = np.zeros(spatial_shape, np.int32)
    n_tubes = max(1, min(3, spatial_shape[-2] // 24))
    for i in range(n_tubes):
        cy = (i + 1) * spatial_shape[-2] / (n_tubes + 1)
        path_y = cy + 4.0 * np.sin(x / 13.0 + i)
        d2 = ((y - path_y) / 2.0) ** 2
        if z is not None:
            cz = spatial_shape[0] / 2.0 + (i - 1) * min(4, spatial_shape[0] // 4)
            d2 = d2 + ((z - cz) / 1.5) ** 2
        tube = np.exp(-d2 / 2.0)
        intensity = np.maximum(intensity, 800.0 * tube)
        mask = tube > 0.25
        labels[mask] = i + 1
        # centerline voxels: nearest row to the analytic path
        xs = np.arange(spatial_shape[-1])
        ys = np.clip(np.round(cy + 4.0 * np.sin(xs / 13.0 + i)).astype(int),
                     0, spatial_shape[-2] - 1)
        if z is None:
            skel[ys, xs] = i + 1
        else:
            zc = int(np.clip(round(spatial_shape[0] / 2.0
                                   + (i - 1) * min(4, spatial_shape[0] // 4)),
                             0, spatial_shape[0] - 1))
            skel[zc, ys, xs] = i + 1
    return intensity, labels, skel


def _neighbor_count(mask):
    """3^n - 1 neighbourhood occupancy via shifts (host, small arrays)."""
    count = np.zeros(mask.shape, np.int32)
    ndim = mask.ndim
    for offsets in np.ndindex(*(3,) * ndim):
        shift = tuple(o - 1 for o in offsets)
        if all(s == 0 for s in shift):
            continue
        count += np.roll(mask.astype(np.int32), shift, axis=tuple(range(ndim)))
    return count


def synthesize_shadow(root, frame_shape, dim_res, no_z, no_t):
    """Create one shadow dataset (input + every pipeline artifact) under
    ``root`` and return its ImInfo."""
    from nellie_tpu.io import ome as ome_mod
    from nellie_tpu.io import tiff
    from nellie_tpu.io.verifier import FileInfo, ImInfo

    intensity, labels, skel = _tube_phantom(frame_shape)
    rng = np.random.default_rng(0)
    t_frames = 1 if no_t else _SHADOW_T
    frames = []
    for t in range(t_frames):
        fr = np.roll(intensity, shift=2 * t, axis=-2)
        frames.append(np.clip(
            fr + rng.normal(100.0, 5.0, frame_shape), 0, 65535).astype(np.uint16))
    data = np.stack(frames)

    axes = ("YX" if no_z else "ZYX") if no_t else ("TYX" if no_z else "TZYX")
    res = {k: v for k, v in (dim_res or {}).items() if v is not None}
    res.setdefault("X", 0.2)
    res.setdefault("Y", 0.2)
    if not no_z:
        res.setdefault("Z", 0.5)
    if not no_t:
        res.setdefault("T", 1.0)
    arr = data if not no_t else data[0]
    path = os.path.join(root, "warmup.ome.tif")
    desc = ome_mod.build_ome_xml(axes, arr.shape, "uint16", dim_res=res)
    tiff.imwrite(path, arr, description=desc)

    fi = FileInfo(path)
    fi.find_metadata()
    fi.load_metadata()
    im_info = ImInfo(fi)

    mask = labels > 0
    ncount = _neighbor_count(skel > 0)
    pixel_class = np.where(skel > 0,
                           np.clip(ncount + 1, 1, 4), 0).astype(np.uint8)
    border = (mask & (_neighbor_count(mask) < 3 ** mask.ndim - 1)).astype(np.uint8)
    distance = np.where(mask, 2.0, 0.0).astype(np.float32)

    def rep(a):
        return np.stack([a] * t_frames) if t_frames > 1 else a[None]

    pp = im_info.pipeline_paths
    im_info.allocate_memory(pp["im_preprocessed"], dtype="float32",
                            data=rep(intensity))
    im_info.allocate_memory(pp["im_instance_label"], dtype="int32",
                            data=rep(labels))
    im_info.allocate_memory(pp["im_skel"], dtype="int32", data=rep(skel))
    im_info.allocate_memory(pp["im_pixel_class"], dtype="uint8",
                            data=rep(pixel_class))
    im_info.allocate_memory(pp["im_skel_relabelled"], dtype="uint32",
                            data=rep(labels.astype(np.uint32)))
    im_info.allocate_memory(pp["im_marker"], dtype="uint8",
                            data=rep((skel > 0).astype(np.uint8)))
    im_info.allocate_memory(pp["im_distance"], dtype="float32",
                            data=rep(distance))
    im_info.allocate_memory(pp["im_border"], dtype="uint8", data=rep(border))
    im_info.allocate_memory(pp["im_obj_label_reassigned"], dtype="int32",
                            data=rep(labels))
    im_info.allocate_memory(pp["im_branch_label_reassigned"], dtype="uint32",
                            data=rep(labels.astype(np.uint32)))

    if not no_t:
        # flow rows: [t-1, origin(z,)y,x, vec(v z,)vy,vx, cost]
        coords = np.argwhere(skel > 0)[::4]
        n = len(coords)
        cols = [np.zeros(n)] + [coords[:, d] for d in range(coords.shape[1])]
        vec = np.zeros((n, coords.shape[1]))
        vec[:, -2] = 2  # the phantom drifts 2 px in y per frame
        cols += [vec[:, d] for d in range(vec.shape[1])]
        cols += [np.full(n, 0.5)]
        np.save(pp["flow_vector_array"], np.column_stack(cols))
    return im_info


class PipelineWarmer:
    """Run shape-true shadow copies of the later stages concurrently so
    their XLA programs are compiled by the time the real run needs them."""

    STAGES = ("label", "network", "markers", "tracking", "reassign", "hierarchy")

    def __init__(self, im_info, device="auto", skip_nodes=False,
                 stages=None):
        self.device = device
        self.skip_nodes = skip_nodes
        self.stages = tuple(stages or self.STAGES)
        self.no_z = im_info.no_z
        self.no_t = im_info.no_t
        self.dim_res = dict(im_info.dim_res or {})
        shape = im_info.shape
        axes = im_info.axes
        spatial = [shape[axes.index(a)] for a in axes if a in "ZYX"]
        self.frame_shape = tuple(int(s) for s in spatial)
        self.root = None
        self._threads = []
        self._pending = 0
        self._lock = threading.Lock()
        self._delete_when_done = False

    def applicable(self):
        if int(np.prod(self.frame_shape)) > _MAX_WARM_VOXELS:
            return False
        if (self.frame_shape, self.no_z, self.no_t) in _WARMED_SHAPES:
            return False
        return True

    # concurrent warm workers: enough to overlap with the main thread's
    # Filter compile without flooding the shared remote compile server
    # (measured: 6 concurrent shadow compiles slowed the whole queue down)
    WORKERS = 2

    def start(self):
        if not self.applicable():
            return False
        _WARMED_SHAPES.add((self.frame_shape, self.no_z, self.no_t))
        self.root = tempfile.mkdtemp(prefix="nellie_warmup_")
        names = [s for s in self.stages
                 if not (self.no_t and s in ("tracking", "reassign"))]
        self._pending = len(names)
        queue = list(names)  # pipeline order: soonest-needed first

        def worker():
            while True:
                with self._lock:
                    if not queue:
                        return
                    name = queue.pop(0)
                self._warm_one(name)

        for i in range(min(self.WORKERS, len(names))):
            t = threading.Thread(target=worker, name=f"nellie-warm-{i}",
                                 daemon=True)
            self._threads.append(t)
            t.start()
        return True

    def _warm_one(self, name):
        try:
            d = os.path.join(self.root, name)
            os.makedirs(d, exist_ok=True)
            im_info = synthesize_shadow(d, self.frame_shape, self.dim_res,
                                        self.no_z, self.no_t)
            self._run_stage(name, im_info)
            logger.debug("warmup: %s compiled", name)
        except Exception as exc:  # noqa: BLE001 — warming is best-effort
            logger.debug("warmup: %s failed: %r", name, exc)
        finally:
            with self._lock:
                self._pending -= 1
                done = self._pending == 0
            if done and self._delete_when_done:
                shutil.rmtree(self.root, ignore_errors=True)

    def _run_stage(self, name, im_info):
        if name == "label":
            from nellie_tpu.stages.labelling import Label
            Label(im_info, device=self.device).run()
        elif name == "network":
            from nellie_tpu.stages.networking import Network
            Network(im_info, device=self.device).run()
        elif name == "markers":
            from nellie_tpu.stages.mocap_marking import Markers
            Markers(im_info, device=self.device).run()
        elif name == "tracking":
            from nellie_tpu.stages.hu_tracking import HuMomentTracking
            HuMomentTracking(im_info, device=self.device).run()
        elif name == "reassign":
            from nellie_tpu.stages.voxel_reassignment import VoxelReassigner
            VoxelReassigner(im_info, device=self.device).run()
        elif name == "hierarchy":
            from nellie_tpu.stages.hierarchical import Hierarchy
            Hierarchy(im_info, skip_nodes=self.skip_nodes,
                      device=self.device).run()

    def finish(self, join_timeout: float = 30.0):
        """Join stragglers briefly, then delete shadow data (now, or when
        the last still-running warm thread exits).  The bounded join
        avoids daemon threads being killed mid-device-call at interpreter
        exit (the runtime aborts noisily); a pathological compile-server
        stall still only delays shutdown by ``join_timeout``."""
        if self.root is None:
            return
        deadline = None
        for t in self._threads:
            if join_timeout:
                import time as _time

                if deadline is None:
                    deadline = _time.monotonic() + join_timeout
                t.join(timeout=max(0.0, deadline - _time.monotonic()))
        with self._lock:
            if self._pending == 0:
                shutil.rmtree(self.root, ignore_errors=True)
            else:
                self._delete_when_done = True
