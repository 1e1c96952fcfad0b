"""Adaptive execution ladder — the TPU analogue of the reference's
device/low-memory retry subsystem (``/root/reference/nellie/utils/
adaptive_run.py``).

The reference tries ``(gpu,fast) -> (gpu,low) -> (cpu,fast) -> (cpu,low)``
around every stage.  On TPU the ladder becomes: whole-frame in HBM ->
halo-padded spatial chunking (smaller working set) -> JAX-on-CPU, with
OOM detection on ``RESOURCE_EXHAUSTED`` XLA errors instead of CuPy OOM
exceptions.
"""
from __future__ import annotations

import numpy as np

from nellie_tpu.utils.base_logger import logger

# Estimated peak memory multiplier per frame (Hessian components +
# eigenvalues + masks), mirroring the reference's heuristic
# (adaptive_run.py:10-11).
PEAK_FRAME_MULTIPLIER = 6.0
MEMORY_HEADROOM = 0.7


def normalize_device(device) -> str:
    device = (device or "auto").lower()
    if device in ("auto", "tpu", "gpu", "cuda", "accel"):
        return "accel"
    if device == "cpu":
        return "cpu"
    raise ValueError(f"Unsupported device '{device}'. Use 'auto', 'tpu', or 'cpu'.")


def accel_available() -> bool:
    import jax

    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def get_accel_free_bytes() -> int | None:
    import jax

    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        if stats is None:
            return None
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use", 0)
        if limit is None:
            return None
        return int(limit - in_use)
    except Exception:
        return None


def get_cpu_available_bytes() -> int | None:
    try:
        import psutil

        return int(psutil.virtual_memory().available)
    except Exception:
        return None


def estimate_frame_bytes(im_info) -> int:
    shape = list(im_info.shape)
    if not im_info.no_t and "T" in im_info.axes:
        shape = shape[1:]
    return int(np.prod(shape)) * 4  # float32 working dtype


def should_use_low_memory(im_info, include_accel: bool = True) -> bool:
    frame_bytes = estimate_frame_bytes(im_info)
    peak = frame_bytes * PEAK_FRAME_MULTIPLIER
    budgets = []
    if include_accel:
        accel_free = get_accel_free_bytes()
        if accel_free is not None:
            budgets.append(accel_free)
    cpu_free = get_cpu_available_bytes()
    if cpu_free is not None:
        budgets.append(cpu_free)
    if not budgets:
        return False
    return peak > min(budgets) * MEMORY_HEADROOM


def mode_candidates(device_order, start_low_memory: bool):
    """Yield (device, low_memory) attempts in escalation order."""
    for device in device_order:
        if start_low_memory:
            yield device, True
        else:
            yield device, False
            yield device, True


def is_oom_error(exc) -> bool:
    if isinstance(exc, MemoryError):
        return True
    text = repr(exc)
    return "RESOURCE_EXHAUSTED" in text or "Out of memory" in text or "OutOfMemory" in text


def is_accel_unavailable_error(exc) -> bool:
    text = repr(exc)
    return "UNAVAILABLE" in text or "failed to connect" in text.lower()


def run_with_ladder(stage_name, device, low_memory, im_info, attempt_fn):
    """Run ``attempt_fn(device, low_memory)`` through the retry ladder."""
    device = normalize_device(device)
    accel_ok = accel_available()
    if device == "accel" and not accel_ok:
        logger.warning("%s: accelerator requested but unavailable; using CPU.", stage_name)
    device_order = ["cpu"] if (device == "cpu" or not accel_ok) else ["accel", "cpu"]

    start_low = bool(low_memory) or should_use_low_memory(
        im_info, include_accel="accel" in device_order
    )
    if start_low and not low_memory:
        logger.info("%s: enabling low-memory mode based on estimated usage.", stage_name)

    last_exc = None
    for dev, low in mode_candidates(device_order, start_low):
        try:
            return attempt_fn(dev, low)
        except Exception as exc:  # noqa: BLE001 - ladder semantics
            last_exc = exc
            if is_accel_unavailable_error(exc) and dev == "accel":
                logger.warning("%s: accelerator unavailable; retrying on CPU.", stage_name)
                continue
            if is_oom_error(exc):
                logger.warning(
                    "%s: OOM on %s/%s; retrying with lower settings.",
                    stage_name, dev, "low-memory" if low else "high-memory",
                )
                continue
            raise
    raise last_exc
