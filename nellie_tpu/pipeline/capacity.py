"""Large-volume segmentation with device-resident accumulation — the
1024³ capacity path (BASELINE config #4, VERDICT r3 directive #6).

The round-2 chunked Filter pulled float32 vesselness for every window
(4.3 GB down at 1024³) and Label re-uploaded it; on a ~10 MB/s tunnel
the wall-clock was exactly bytes/link (~7.9 GB moved, 630-800 s).  Here
each window's vesselness core is written into a persistent DONATED
device buffer (float16 by default — half the HBM of f32, ~1e-3 relative
threshold quantisation), then thresholding (sampled histograms), the
percentile-1 finalize mask, hole filling, the area filter and connected
components all run on the full volume in HBM.  Only the final product
crosses the link:

  emit="labels"         uint16 instance labels       (2.1 GB at 1024³)
  emit="sparse_labels"  packed fg mask + compacted uint16 values
                        (~0.27 GB at 1024³; dense labels rebuilt on host)
  emit="mask"           bit-packed foreground mask   (0.13 GB at 1024³)

Total bytes at 1024³: ~2.5 GB up (uint16 raw windows incl. halo
overlap) + 2.1 GB down (labels) ≈ 4.6 GB — or ~2.7 GB with
emit="mask" (~3x less than round 2's 7.9 GB).  ``bytes_up``/
``bytes_down`` are tracked and returned so the link-boundedness is
auditable (the reference's counterpart is the memmap-streamed chunk
loop, ``/root/reference/nellie/segmentation/filtering.py:855-908``).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from nellie_tpu.kernels import ccl
from nellie_tpu.kernels import frangi as frangi_k
from nellie_tpu.kernels import thresholds as thr_k
from nellie_tpu.kernels.filters import uniform_filter
from nellie_tpu.utils import transfer
from nellie_tpu.utils.base_logger import logger
from nellie_tpu.utils.chunking import (
    compute_chunk_shape,
    iter_uniform_windows,
    uniform_window_shapes,
)


@partial(jax.jit, static_argnames=("params", "core_shape"), donate_argnums=(0,))
def _accumulate_window(vessel_buf, window, core_offset, vol_offset,
                       params, core_shape):
    """One window's vesselness core written in place into the volume
    buffer (donation keeps a single allocation alive across windows)."""
    v, _ = frangi_k.vesselness_frame(window, params)
    core = lax.dynamic_slice(
        v, tuple(core_offset[i] for i in range(len(core_shape))), core_shape)
    return lax.dynamic_update_slice(
        vessel_buf, core.astype(vessel_buf.dtype),
        tuple(vol_offset[i] for i in range(len(core_shape))))


@partial(jax.jit, static_argnames=("min_area", "fill", "step", "nbins",
                                   "max_samples", "emit"),
         donate_argnums=(0,))
def _segment_from_vessel(vessel_buf, min_area, fill, step, nbins,
                         max_samples, emit):
    """Finalize + Label on the full in-HBM vesselness volume.

    Identical math to Filter.finalize + Label (``stages/filtering.py``,
    ``stages/labelling.py``) expressed so the f32 volume never
    materialises: the percentile/threshold histograms read strided
    SAMPLES, and ``vessel * finalize_mask > thr`` is rewritten as
    ``(vessel > thr) & finalize_mask`` (exact for thr > 0)."""
    flat = vessel_buf.reshape(-1)
    sample = flat[::step].astype(jnp.float32)

    # finalize: percentile-1 of positive samples -> opening mask
    pos = sample > 0
    pct = frangi_k.masked_percentile(sample, pos, 1.0)
    m1 = vessel_buf > pct.astype(vessel_buf.dtype)
    er = m1
    for axis in range(vessel_buf.ndim):
        for o in (1, -1):
            er = er & _shift_bool(m1, axis, o)
    m1o = er
    for axis in range(vessel_buf.ndim):
        for o in (1, -1):
            m1o = m1o | _shift_bool(er, axis, o)

    # label threshold: log-domain min(triangle, otsu) over the finalized
    # sample (sample masked by the opening mask's strided view)
    m1o_sample = m1o.reshape(-1)[::step]
    eff = jnp.where(m1o_sample, sample, 0.0)
    valid = eff > 0
    logv = jnp.log10(jnp.where(valid, eff, 1.0))
    tri = thr_k.triangle_threshold(logv, valid, nbins)
    ots, _ = thr_k.otsu_threshold(logv, valid, nbins)
    thr = jnp.minimum(10.0 ** tri, 10.0 ** ots)
    any_valid = jnp.any(valid)
    thr = jnp.where(any_valid, thr, jnp.inf)

    mask = (vessel_buf > thr.astype(vessel_buf.dtype)) & m1o
    if fill:
        mask = ccl.fill_holes(mask)
    mask = ccl.remove_small_components(mask, min_area)
    mask = uniform_filter(mask.astype(jnp.float32), 3) > 0.5
    if emit == "mask":
        m8 = mask.reshape(mask.shape[:-1] + (-1, 8)).astype(jnp.uint8)
        weights = jnp.uint8(1) << (7 - jnp.arange(8, dtype=jnp.uint8))
        packed = jnp.sum(m8 * weights, axis=-1).astype(jnp.uint8)
        return packed, jnp.sum(mask).astype(jnp.int64)
    labels, n = ccl.label(mask)
    if emit == "sparse_labels":
        # bit-packed fg support + compacted uint16 values: ~8x fewer
        # downlink bytes than dense uint16 labels at typical <2% density
        flat_fg = mask.reshape(-1)
        cap = flat_fg.size // transfer.SPARSE_CAP_DIV
        idx = jnp.flatnonzero(flat_fg, size=cap, fill_value=flat_fg.size - 1)
        vals = labels.astype(jnp.uint16).reshape(-1)[idx]
        return (transfer.packbits(flat_fg), vals,
                jnp.sum(flat_fg).astype(jnp.int64)), n
    return labels.astype(jnp.uint16), n


def _shift_bool(mask, axis, o):
    pad = [(0, 0)] * mask.ndim
    sl = [slice(None)] * mask.ndim
    if o > 0:
        sl[axis] = slice(o, None)
        pad[axis] = (0, o)
    else:
        sl[axis] = slice(None, o)
        pad[axis] = (-o, 0)
    return jnp.pad(mask[tuple(sl)], pad)


def segment_path(
    filepath,
    emit: str = "sparse_labels",
    min_area: int = 4,
    output_dir=None,
    write_labels: bool = True,
    **kwargs,
):
    """Path-level entry for the capacity path: load a single large
    volume (no T axis), segment it device-resident, and (optionally)
    write the ``im_instance_label`` artifact so downstream stages and
    the GUI can pick it up.

    Use this instead of ``Filter(low_memory=True) + Label`` when the
    volume is link-bound: only ~0.4 GB crosses per 1024³ gigavoxel
    instead of ~7.9 GB (reference counterpart: the memmap-streamed chunk
    loop, ``/root/reference/nellie/segmentation/filtering.py:855-908``)."""
    from nellie_tpu.io.verifier import FileInfo, ImInfo

    fi = FileInfo(str(filepath), output_dir=output_dir)
    fi.find_metadata()
    fi.load_metadata()
    im_info = ImInfo(fi)
    volume = np.asarray(im_info.get_memmap(im_info.im_path))
    while volume.ndim > 3 and volume.shape[0] == 1:  # singleton T axis
        volume = volume[0]
    if volume.ndim not in (2, 3):
        raise ValueError(
            f"capacity path expects one 2D/3D volume, got shape {volume.shape}; "
            "use pipeline.run for time series")
    spacing = ((im_info.dim_res["Y"], im_info.dim_res["X"]) if volume.ndim == 2
               else (im_info.dim_res["Z"], im_info.dim_res["Y"], im_info.dim_res["X"]))
    params = frangi_k.FrangiParams(
        sigmas=tuple(kwargs.pop("sigmas", (0.75, 1.1, 1.6))),
        spacing=spacing,
        z_ratio=(1.0 if volume.ndim == 2
                 else (im_info.dim_res["Z"] / im_info.dim_res["X"] or 1.0)))
    out = segment_volume(volume, params, min_area=min_area, emit=emit, **kwargs)
    if out.get("label_overflow"):
        raise RuntimeError(
            f"{out['n_labels']} components exceed the capacity path's "
            "uint16 label emit; run the standard Filter+Label pipeline "
            "(int32 labels) for this volume")
    if write_labels and "labels" in out:
        im_info.allocate_memory(
            im_info.pipeline_paths["im_instance_label"], dtype="int32",
            data=out["labels"].astype(np.int32),
            description="instance segmentation (capacity path)")
        out["im_info"] = im_info
    return out


def segment_volume(
    volume: np.ndarray,
    params: frangi_k.FrangiParams,
    min_area: int = 4,
    emit: str = "labels",
    max_chunk_voxels: int = int(3.2e7),
    vessel_dtype=jnp.float16,
    threshold_sampling_pixels: int = 1_000_000,
    histogram_nbins: int = 256,
):
    """Segment one large (Z, Y, X) volume; returns a dict with the
    product (``labels`` uint16 or bit-packed ``mask`` + ``fg_count``),
    the label/fg counts and the measured ``bytes_up``/``bytes_down``.

    The X extent must be a multiple of 8 for emit="mask" (bit packing).
    """
    volume = np.asarray(volume)
    shape = volume.shape
    sigma_vec = params.sigma_vec(max(params.sigmas))
    halo = tuple(int(np.ceil(params.truncate * float(s))) for s in sigma_vec)
    chunk_shape = compute_chunk_shape(shape, max_chunk_voxels)
    core_shape, ext_shape = uniform_window_shapes(shape, chunk_shape, halo)

    dev = jax.devices()[0]
    vessel_buf = jax.device_put(jnp.zeros(shape, vessel_dtype), dev)
    bytes_up = 0
    n_windows = 0
    for owned, ext, offset, local in iter_uniform_windows(shape, chunk_shape, halo):
        window = np.ascontiguousarray(volume[ext])
        bytes_up += window.nbytes
        n_windows += 1
        win_dev = jax.device_put(window, dev)
        # write the full core (later windows overwrite overlap regions —
        # a fixed, deterministic order)
        core_start = tuple(e.start + o for e, o in zip(ext, offset))
        vessel_buf = _accumulate_window(
            vessel_buf, win_dev, jnp.asarray(offset, jnp.int32),
            jnp.asarray(core_start, jnp.int32), params, core_shape)

    step = max(int(np.prod(shape)) // max(1, threshold_sampling_pixels), 1)
    out, count = _segment_from_vessel(
        vessel_buf, min_area, volume.ndim == 3, step, histogram_nbins,
        threshold_sampling_pixels, emit)
    label_overflow = emit != "mask" and int(count) > 0xFFFF
    if label_overflow:
        # the uint16 byte-cut emits can't represent >65535 components;
        # wrapped ids would silently merge/erase labels downstream
        logger.error(
            "capacity segment: %d components exceed the uint16 label "
            "emit — labels are wrapped and must not be used; run the "
            "standard Filter+Label path (int32 labels) for this volume",
            int(count))
    if emit == "sparse_labels":
        packed_dev, vals_dev, fg_dev = out
        fg_count = int(fg_dev)
        cap = int(np.prod(shape)) // transfer.SPARSE_CAP_DIV
        if fg_count > cap:
            # >6.25% foreground: the compacted pull would truncate; redo
            # with the dense emit (rare — measured densities are <2%)
            logger.warning(
                "capacity segment: %d fg voxels exceed sparse capacity %d; "
                "falling back to dense labels", fg_count, cap)
            return segment_volume(
                volume, params, min_area=min_area, emit="labels",
                max_chunk_voxels=max_chunk_voxels, vessel_dtype=vessel_dtype,
                threshold_sampling_pixels=threshold_sampling_pixels,
                histogram_nbins=histogram_nbins)
        packed = np.asarray(packed_dev)
        vals = np.asarray(vals_dev)
        bytes_down = packed.nbytes + vals.nbytes
        bits = np.unpackbits(packed, bitorder="little")
        idx = np.flatnonzero(bits)
        labels = np.zeros(int(np.prod(shape)), np.uint16)
        labels[idx] = vals[: len(idx)]
        logger.info("capacity segment: %d windows, %.2f GB up, %.2f GB down "
                    "(sparse)", n_windows, bytes_up / 1e9, bytes_down / 1e9)
        return {"labels": labels.reshape(shape), "n_labels": int(count),
                "fg_count": fg_count, "label_overflow": label_overflow,
                "emit": "sparse_labels",
                "bytes_up": bytes_up, "bytes_down": bytes_down}
    result = np.asarray(out)
    bytes_down = result.nbytes
    logger.info("capacity segment: %d windows, %.2f GB up, %.2f GB down",
                n_windows, bytes_up / 1e9, bytes_down / 1e9)
    if emit == "mask":
        return {"mask_packed": result, "fg_count": int(count), "emit": "mask",
                "bytes_up": bytes_up, "bytes_down": bytes_down}
    # "emit" records what actually produced the result — the sparse path
    # falls back here on capacity overflow, and the caller's requested
    # emit would then mislabel the measured bytes (ADVICE r3)
    return {"labels": result, "n_labels": int(count),
            "label_overflow": label_overflow, "emit": "labels",
            "bytes_up": bytes_up, "bytes_down": bytes_down}
