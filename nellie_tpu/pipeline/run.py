"""Main entry point for the nellie_tpu pipeline.

Same orchestration contract as the reference
(``/root/reference/nellie/run.py:18-130``): the seven stages run in order
through the on-disk artifact store, so any stage can be re-run
independently and the GUI's artifact-existence resume works unchanged.
``timeit=True`` prints per-stage wall time (the reference's benchmark
harness and this build's bench.py metric source).
"""
from __future__ import annotations

import time

from nellie_tpu.io.verifier import FileInfo, ImInfo
from nellie_tpu.stages.filtering import Filter
from nellie_tpu.stages.hierarchical import Hierarchy
from nellie_tpu.stages.hu_tracking import HuMomentTracking
from nellie_tpu.stages.labelling import Label
from nellie_tpu.stages.mocap_marking import Markers
from nellie_tpu.stages.networking import Network
from nellie_tpu.stages.voxel_reassignment import VoxelReassigner


def run(
    file_info,
    remove_edges=False,
    otsu_thresh_intensity=False,
    threshold=None,
    timeit=False,
    device="auto",
    low_memory=False,
    skip_nodes=False,
    return_timings=False,
    mesh=None,
    warm_start=True,
    fused=True,
    config=None,
):
    """Run the full pipeline on a prepared :class:`FileInfo`.

    ``mesh``: optional ``jax.sharding.Mesh``.  With a ``"z"`` axis the
    per-frame segmentation kernels (Filter/Label/Network/Markers) are
    GSPMD-sharded over the spatial axis; with a ``"t"`` axis (>1) the
    fused path executes the WHOLE frame batch as one sharded program
    (frames data-parallel over ``t``, spatially sharded over ``z`` for
    the stencil phase — ``pipeline/fused.py:_run_batch_mesh``) and
    tracking/reassignment/hierarchy run their mesh frame-parallel paths.
    Artifacts match single-device execution (discrete artifacts exactly
    for t-only sharding; to float-reassociation tolerance when spatial
    sharding is active — see the driver dryrun and tests/test_mesh.py).

    ``warm_start``: compile the later stages' XLA programs in background
    threads (on shape-true shadow data) while Filter owns the device, so
    a cold run pays ~max(stage compile) instead of the sum — see
    :mod:`nellie_tpu.pipeline.warmup`.

    ``fused``: run stages 1-4 with device-resident handoff (one frame
    upload, intermediates stay in HBM, artifacts written behind compute
    — see :mod:`nellie_tpu.pipeline.fused`).  Artifacts are identical to
    the per-stage path; set False to force the classic stage-by-stage
    loop (always used for ``low_memory`` and mesh 't'-batch runs).

    ``config``: a :class:`nellie_tpu.plugin.config.SettingsConfig` (or a
    dict / path to its JSON) carrying the full ~60-field per-stage
    parameter tree — the same object the GUI's Settings tab round-trips
    (reference ``nellie_napari/nellie_settings.py:20-99``).  When given,
    it drives EVERY stage's constructor kwargs plus the basic toggles
    (``remove_edges``, ``voxel_reassign``, ``remove_intermediates``,
    ``analyze_node_level``), and the corresponding convenience arguments
    above are ignored.

    Returns the :class:`ImInfo` (and per-stage timings dict if
    ``return_timings``).
    """
    # warm persistent XLA compile cache: repeat runs (same shapes/params)
    # skip the remote compile server entirely — NELLIE_JAX_CACHE=0 opts out
    from nellie_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    im_info = ImInfo(file_info)
    timings = {}

    stage_kw = None
    voxel_reassign = True
    remove_intermediates = False
    if config is not None:
        from nellie_tpu.plugin import config as cfg_mod

        if isinstance(config, str):
            cfg = cfg_mod.SettingsConfig.load(config)
        elif isinstance(config, dict):
            cfg = cfg_mod.SettingsConfig.from_dict(config)
        else:
            cfg = config
        f_kw = cfg_mod.preprocessing_params(cfg)
        f_kw["remove_edges"] = cfg.remove_edges
        stage_kw = {
            "filter": f_kw,
            "label": cfg_mod.segmentation_label_params(cfg),
            "network": cfg_mod.segmentation_network_params(cfg),
            "markers": cfg_mod.mocap_params(cfg),
            "tracking": cfg_mod.tracking_params(cfg),
            "reassign": cfg_mod.reassign_params(cfg),
            "hierarchy": cfg_mod.feature_params(cfg),
        }
        voxel_reassign = cfg.voxel_reassign
        remove_intermediates = cfg.remove_intermediates
        # feature_params omits skip_nodes unless the config asks for node
        # analysis — Hierarchy's own default (True) then applies, matching
        # the GUI / reference semantics (skip_nodes = not analyze_node_level,
        # /root/reference/nellie_napari/nellie_processor.py:551)
        skip_nodes = stage_kw["hierarchy"].get("skip_nodes", True)
        # the fused whole-frame loop can't honor per-stage low_memory;
        # fall back to the classic adaptive ladder for those runs
        low_memory = low_memory or any(
            stage_kw[k].get("low_memory") for k in
            ("filter", "label", "network", "markers"))

    warmer = None
    if warm_start and not low_memory and mesh is None and device != "cpu":
        try:
            import os as _os

            import jax
            import numpy as _np

            # warming pays off when compiles are slow (remote TPU compile
            # server); on the CPU backend they are not worth shadow runs
            if jax.default_backend() != "cpu":
                from nellie_tpu.pipeline.warmup import PipelineWarmer

                # when the fused path will run frame-group batched, its
                # ONE chain program subsumes the label/network/markers
                # kernels — their shadow compiles would only contend with
                # the chain's own compile on the shared compile server
                warm_stages = None
                from nellie_tpu.pipeline.fused import _BATCH_GROUP_VOX

                spatial = [im_info.shape[im_info.axes.index(a)]
                           for a in im_info.axes if a in "ZYX"]
                frame_vox = int(_np.prod(spatial))
                num_t = (im_info.shape[im_info.axes.index("T")]
                         if not im_info.no_t and "T" in im_info.axes else 1)
                if (fused and num_t > 1
                        and 2 * frame_vox <= _BATCH_GROUP_VOX
                        and _os.environ.get("NELLIE_FUSED_BATCH") != "0"):
                    warm_stages = ("tracking", "reassign", "hierarchy")
                warmer = PipelineWarmer(im_info, device=device,
                                        skip_nodes=skip_nodes,
                                        stages=warm_stages)
                warmer.start()
        except Exception:  # noqa: BLE001 — warming is best-effort
            warmer = None

    def timed(name, stage):
        start = time.perf_counter()
        stage.run()
        timings[name] = time.perf_counter() - start

    # mesh with a t-axis: the fused path executes the whole frame batch
    # as one sharded program (FusedSegmentation._run_batch_mesh) — the
    # production multi-chip path, artifacts identical to single-device
    use_fused = bool(fused) and not low_memory

    try:
        if use_fused:
            from nellie_tpu.pipeline.fused import FusedSegmentation
            from nellie_tpu.utils import adaptive_run

            seg = FusedSegmentation(
                im_info, remove_edges=remove_edges,
                otsu_thresh_intensity=otsu_thresh_intensity,
                threshold=threshold, device=device, mesh=mesh,
                # tracking follows in this process: leave raw/frangi/
                # distance device arrays in HBM for it (device_cache)
                cache_frames=not im_info.no_t,
                **({} if stage_kw is None else {
                    "filter_kwargs": stage_kw["filter"],
                    "label_kwargs": stage_kw["label"],
                    "network_kwargs": stage_kw["network"],
                    "markers_kwargs": stage_kw["markers"]}))
            start = time.perf_counter()
            try:
                seg.run()
                timings["seg_fused"] = time.perf_counter() - start
            except Exception as exc:  # noqa: BLE001 — recoverable -> ladder
                # same recoverable classes as the per-stage ladder: OOM
                # and accelerator-unavailable (e.g. a dropped tunnel
                # link) retry through the classic per-stage path, which
                # can land on CPU; anything else is a real error
                if not (adaptive_run.is_oom_error(exc)
                        or adaptive_run.is_accel_unavailable_error(exc)):
                    raise
                from nellie_tpu.utils.base_logger import logger

                logger.warning(
                    "Fused segmentation failed with a recoverable error "
                    "(%r); falling back to the per-stage adaptive ladder.",
                    exc)
                use_fused = False
        if not use_fused:
            if stage_kw is not None:
                timed("filter", Filter(im_info, mesh=mesh, **stage_kw["filter"]))
                timed("label", Label(im_info, mesh=mesh, **stage_kw["label"]))
                timed("network", Network(im_info, **stage_kw["network"]))
                timed("markers", Markers(im_info, **stage_kw["markers"]))
            else:
                timed("filter", Filter(im_info, remove_edges=remove_edges, device=device,
                                       low_memory=low_memory, mesh=mesh))
                timed("label", Label(im_info, otsu_thresh_intensity=otsu_thresh_intensity,
                                     threshold=threshold, device=device, low_memory=low_memory,
                                     mesh=mesh))
                timed("network", Network(im_info, device=device))
                timed("markers", Markers(im_info, device=device))
        if stage_kw is not None:
            timed("tracking", HuMomentTracking(im_info, mesh=mesh,
                                               **stage_kw["tracking"]))
            if voxel_reassign:
                timed("reassign", VoxelReassigner(im_info, mesh=mesh,
                                                  **stage_kw["reassign"]))
            timed("hierarchy", Hierarchy(im_info, mesh=mesh, **stage_kw["hierarchy"]))
            if remove_intermediates:
                im_info.remove_intermediates()
        else:
            timed("tracking", HuMomentTracking(im_info, device=device,
                                               low_memory=low_memory, mesh=mesh))
            timed("reassign", VoxelReassigner(im_info, device=device, mesh=mesh))
            timed("hierarchy", Hierarchy(im_info, skip_nodes=skip_nodes, device=device,
                                         low_memory=low_memory, mesh=mesh))
    finally:
        if warmer is not None:
            warmer.finish()

    timings["total"] = sum(timings.values())
    if timeit:
        if "seg_fused" in timings:
            print(f"Nellie Pipeline: Fused Filter+Label+Network+Markers took "
                  f"{timings['seg_fused']:.4f} seconds")
        else:
            print(f"Nellie Pipeline: Filter step took {timings['filter']:.4f} seconds")
            print(f"Nellie Pipeline: Label step took {timings['label']:.4f} seconds")
            print(f"Nellie Pipeline: Network step took {timings['network']:.4f} seconds")
            print(f"Nellie Pipeline: Markers step took {timings['markers']:.4f} seconds")
        print(f"Nellie Pipeline: HuMomentTracking step took {timings['tracking']:.4f} seconds")
        if "reassign" in timings:
            print(f"Nellie Pipeline: VoxelReassigner step took {timings['reassign']:.4f} seconds")
        print(f"Nellie Pipeline: Hierarchy step took {timings['hierarchy']:.4f} seconds")
        print(f"Nellie Pipeline: Total time took {timings['total']:.4f} seconds")

    if return_timings:
        return im_info, timings
    return im_info


def run_path(
    filepath,
    ch: int = 0,
    t_start: int = 0,
    t_end=None,
    output_dir=None,
    **kwargs,
):
    """Convenience wrapper: path -> FileInfo (metadata autodetect) -> run()."""
    file_info = FileInfo(filepath, output_dir=output_dir)
    file_info.find_metadata()
    file_info.load_metadata()
    if ch and "C" in (file_info.axes or ""):
        file_info.change_selected_channel(ch)
    if (t_start or t_end is not None) and "T" in (file_info.axes or ""):
        file_info.select_temporal_range(t_start, t_end)
    errors = file_info.get_validation_errors()
    if errors:
        raise ValueError(f"Metadata incomplete for {filepath}: {errors}. "
                         "Fix axes/resolutions via FileInfo before running.")
    return run(file_info, **kwargs)
