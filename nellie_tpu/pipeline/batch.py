"""Multi-file data parallelism: feed the mesh's 't' axis with frames
drawn from a whole batch of files.

The reference's batch processing is a strictly sequential Python loop
over files (``/root/reference/nellie/cli.py:6-13``,
``nellie_processor.py:323-331``). Here, when every file in the batch has
the same canonical shape and resolutions (the same requirement the
reference GUI imposes on folder batches, ``nellie_fileselect.py:597-610``),
the Filter, Label, Network and Markers stages run data-parallel across
FILES: the combined (file, t) frame stream fills (tb = mesh t-extent)-
sized groups that execute as one GSPMD-sharded program, exactly the
BASELINE config #5 shape (batch single-channel organelle unmixing). The
tracking/reassignment/feature stages — sequential in t within a file —
run file-parallel: each file's stage loop is placed on its own mesh
device and driven concurrently (:func:`_per_file_stages_parallel`).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from nellie_tpu.io.verifier import ImInfo
from nellie_tpu.stages.filtering import Filter
from nellie_tpu.stages.hierarchical import Hierarchy
from nellie_tpu.stages.hu_tracking import HuMomentTracking
from nellie_tpu.stages.labelling import Label
from nellie_tpu.stages.mocap_marking import Markers
from nellie_tpu.stages.networking import Network
from nellie_tpu.stages.voxel_reassignment import VoxelReassigner
from nellie_tpu.utils.base_logger import logger


def _compatible(im_infos) -> bool:
    first = im_infos[0]
    key = (tuple(first.shape), first.axes,
           tuple(sorted((k, v) for k, v in first.dim_res.items() if v)))
    return all(
        (tuple(im.shape), im.axes,
         tuple(sorted((k, v) for k, v in im.dim_res.items() if v))) == key
        for im in im_infos[1:])


def _frame_stream(stage_objs):
    """(stage_index, t) pairs across all files, file-major."""
    for i, s in enumerate(stage_objs):
        for t in range(s.num_t):
            yield i, t


def _segment_files_batched(im_infos, mesh, filter_kwargs, label_kwargs):
    """Filter + Label across files, frames grouped over the mesh 't' axis."""
    from nellie_tpu.mesh.sharded import (
        batch_sharding,
        batched_filter_kernel,
        batched_label_kernel,
    )

    tb = int(mesh.shape["t"])

    filters = [Filter(im, mesh=mesh, **filter_kwargs) for im in im_infos]
    for f in filters:
        f._active_device = "accel"
        f._active_low_memory = False
        f._get_t()
        f._allocate_memory()
        f._set_default_sigmas()
    params = filters[0]._params
    # canonical artifacts are always T-first (save_ome_tiff prepends T;
    # no_t just means the extent is 1), so indexing [t] is unconditional
    frame_shape = filters[0].im_memmap.shape[1:]
    sharding = batch_sharding(mesh, frame_shape)

    work = list(_frame_stream(filters))
    pending = None
    for start in range(0, len(work), tb):
        group = work[start:start + tb]
        frames = np.stack([
            np.asarray(filters[i].im_memmap[t]) for i, t in group])
        if len(group) < tb:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], tb - len(group), axis=0)])
        batch = jax.device_put(np.ascontiguousarray(frames), sharding)
        out = batched_filter_kernel(
            batch, params, True, filters[0].max_threshold_samples,
            filters[0].remove_edges)
        if pending is not None:
            for k, (i, t) in enumerate(pending[0]):
                filters[i]._write_frame(t, pending[1][k])
        pending = (group, out)
    if pending is not None:
        for k, (i, t) in enumerate(pending[0]):
            filters[i]._write_frame(t, pending[1][k])

    from nellie_tpu.utils import transfer

    labels = [Label(im, mesh=mesh, **label_kwargs) for im in im_infos]
    for l in labels:
        l._get_t()
        l._allocate_memory()
    use_intensity = (labels[0].otsu_thresh_intensity
                     or labels[0].threshold is not None)
    fill = not im_infos[0].no_z
    work = list(_frame_stream(labels))
    pending = None
    for start in range(0, len(work), tb):
        group = work[start:start + tb]
        it_b, ft_b, valid_b, frangi_l, orig_l = [], [], [], [], []
        for i, t in group:
            l = labels[i]
            it, ft = l._compute_frame_thresholds(l.im_memmap[t], l.frangi_memmap[t])
            it_b.append(0.0 if it is None else it)
            ft_b.append(0.0 if ft is None else ft)
            valid_b.append(ft is not None)
            frangi_l.append(np.asarray(l.frangi_memmap[t]))
            orig_l.append(np.asarray(l.im_memmap[t], np.float32))
        frangi = np.stack(frangi_l)
        orig = np.stack(orig_l)
        if len(group) < tb:
            pad = tb - len(group)
            frangi = np.concatenate([frangi, np.repeat(frangi[-1:], pad, axis=0)])
            orig = np.concatenate([orig, np.repeat(orig[-1:], pad, axis=0)])
            it_b += [0.0] * pad
            ft_b += [0.0] * pad
            valid_b += [False] * pad
        lab = batched_label_kernel(
            jax.device_put(np.ascontiguousarray(frangi), sharding),
            jax.device_put(np.ascontiguousarray(orig), sharding),
            jnp.asarray(it_b, jnp.float32), jnp.asarray(ft_b, jnp.float32),
            jnp.asarray(valid_b),
            labels[0].min_area_pixels, fill, use_intensity)
        # uint16-narrowed pulls, same as the standalone Label loop
        lab_preps = [transfer.prep_label_pull(lab[k]) for k in range(len(group))]
        if pending is not None:
            for k, (i, t) in enumerate(pending[0]):
                labels[i].instance_label_memmap[t, ...] = transfer.finish_label_pull(
                    pending[1][k], np.int32)
                labels[i].instance_label_memmap.flush()
        pending = (group, lab_preps)
    if pending is not None:
        for k, (i, t) in enumerate(pending[0]):
            labels[i].instance_label_memmap[t, ...] = transfer.finish_label_pull(
                pending[1][k], np.int32)
            labels[i].instance_label_memmap.flush()


def _network_markers_files_batched(im_infos, mesh, device):
    """Network + Markers across files, frames grouped over the mesh 't'
    axis — same grouped-dispatch/write-behind pattern as
    ``_segment_files_batched`` (VERDICT r3 #8)."""
    from nellie_tpu.mesh.sharded import (
        batch_sharding,
        batched_markers_kernel,
        batched_network_kernel,
    )

    tb = int(mesh.shape["t"])

    networks = [Network(im, device=device) for im in im_infos]
    for n in networks:
        n._get_t()
        n._allocate_memory()
    frame_shape = networks[0].label_memmap.shape[1:]
    sharding = batch_sharding(mesh, frame_shape)
    sampling = networks[0].scaling

    work = list(_frame_stream(networks))
    pending = None
    for start in range(0, len(work), tb):
        group = work[start:start + tb]
        labels = np.stack([np.asarray(networks[i].label_memmap[t], np.int32)
                           for i, t in group])
        frangi = np.stack([np.asarray(networks[i].im_frangi_memmap[t], np.float32)
                           for i, t in group])
        if len(group) < tb:
            pad = tb - len(group)
            labels = np.concatenate([labels, np.repeat(labels[-1:], pad, axis=0)])
            frangi = np.concatenate([frangi, np.repeat(frangi[-1:], pad, axis=0)])
        skel_b, pc_b, branch_b = batched_network_kernel(
            jax.device_put(np.ascontiguousarray(labels), sharding),
            jax.device_put(np.ascontiguousarray(frangi), sharding), sampling)
        # same foreground-sparse pull preps as the standalone loop —
        # the stage's _write_frame reconstructs via finish_sparse
        from nellie_tpu.stages.networking import _sparse_bundle as _net_sparse

        preps = [_net_sparse(skel_b[k], pc_b[k], branch_b[k])
                 for k in range(len(group))]
        if pending is not None:
            for (i, t), devs in zip(*pending):
                networks[i]._write_frame(t, *devs)
        pending = (group, preps)
    if pending is not None:
        for (i, t), devs in zip(*pending):
            networks[i]._write_frame(t, *devs)

    markers = [Markers(im, device=device) for im in im_infos]
    for m in markers:
        m._get_t()
        m._allocate_memory()
        m._set_default_sigmas()
    params = markers[0]._params
    work = list(_frame_stream(markers))
    pending = None
    for start in range(0, len(work), tb):
        group = work[start:start + tb]
        intensity = np.stack([np.asarray(markers[i].im_memmap[t])
                              for i, t in group])
        labels = np.stack([np.asarray(markers[i].label_memmap[t], np.int32)
                           for i, t in group])
        if len(group) < tb:
            pad = tb - len(group)
            intensity = np.concatenate([intensity, np.repeat(intensity[-1:], pad, axis=0)])
            labels = np.concatenate([labels, np.repeat(labels[-1:], pad, axis=0)])
        mk_b, di_b, bo_b = batched_markers_kernel(
            jax.device_put(np.ascontiguousarray(intensity), sharding),
            jax.device_put(np.ascontiguousarray(labels), sharding), params)
        from nellie_tpu.stages.mocap_marking import _sparse_bundle as _mk_sparse

        outs = [_mk_sparse(mk_b[k], di_b[k], bo_b[k])
                for k in range(len(group))]
        if pending is not None:
            for (i, t), devs in zip(*pending):
                markers[i]._write_frame(t, *devs)
        pending = (group, outs)
    if pending is not None:
        for (i, t), devs in zip(*pending):
            markers[i]._write_frame(t, *devs)


def _per_file_stages_parallel(im_infos, mesh, device, skip_nodes):
    """Stages 5-7 (tracking, reassignment, hierarchy) across files.

    These stages are sequential in t WITHIN a file (label propagation)
    but independent ACROSS files, so the batch-level data parallelism is
    file placement: round-robin the files over the mesh's devices and
    drive them from a thread pool (``jax.default_device`` is
    thread-local, so each file's kernels execute on its own chip) — the
    DCN-analog file-level sharding of SURVEY §5.8(iv).  The reference
    runs the same stages strictly sequentially per file
    (``/root/reference/nellie/cli.py:6-13``)."""
    from concurrent.futures import ThreadPoolExecutor

    devs = list(mesh.devices.flatten())

    def one(i):
        im_info = im_infos[i]
        with jax.default_device(devs[i % len(devs)]):
            HuMomentTracking(im_info, device=device).run()
            VoxelReassigner(im_info, device=device).run()
            Hierarchy(im_info, skip_nodes=skip_nodes, device=device).run()

    workers = max(1, min(len(devs), len(im_infos)))
    logger.info("Batch: stages 5-7 file-parallel over %d devices (%d files)",
                workers, len(im_infos))
    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(one, range(len(im_infos))))


def run_files(file_infos, mesh=None, remove_edges=False,
              otsu_thresh_intensity=False, threshold=None,
              device="auto", low_memory=False, skip_nodes=False,
              timeit=False):
    """Run the pipeline over a batch of prepared FileInfos.

    With a multi-'t' mesh and shape-compatible files, Filter+Label run
    data-parallel across the whole (file, t) frame stream; otherwise
    files process sequentially through the standard ``run()``.
    Returns the list of ImInfos.
    """
    import time

    from nellie_tpu.pipeline.run import run

    im_infos = [ImInfo(fi) for fi in file_infos]
    batched = (mesh is not None and int(mesh.shape.get("t", 1)) > 1
               and len(im_infos) > 1 and not low_memory
               and _compatible(im_infos))
    if not batched:
        for fi in file_infos:
            run(fi, remove_edges=remove_edges,
                otsu_thresh_intensity=otsu_thresh_intensity,
                threshold=threshold, device=device, low_memory=low_memory,
                skip_nodes=skip_nodes, mesh=mesh, timeit=timeit)
        return im_infos

    logger.info("Batch: %d files data-parallel over mesh t=%d",
                len(im_infos), int(mesh.shape["t"]))

    timings = {}

    def timed(name, fn):
        start = time.perf_counter()
        fn()
        timings[name] = time.perf_counter() - start

    timed("segment (batched Filter+Label)", lambda: _segment_files_batched(
        im_infos, mesh,
        filter_kwargs={"remove_edges": remove_edges, "device": device},
        label_kwargs={"otsu_thresh_intensity": otsu_thresh_intensity,
                      "threshold": threshold, "device": device}))

    timed("network+markers (batched)", lambda: _network_markers_files_batched(
        im_infos, mesh, device))

    timed("stages 5-7 (file-parallel)", lambda: _per_file_stages_parallel(
        im_infos, mesh, device, skip_nodes))
    if timeit:
        for name, secs in timings.items():
            print(f"Nellie Batch: {name} took {secs:.4f} seconds")
        print(f"Nellie Batch: Total time took {sum(timings.values()):.4f} seconds")
    return im_infos
