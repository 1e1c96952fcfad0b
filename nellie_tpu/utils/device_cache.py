"""Budgeted cross-stage device-array cache.

The reference pipeline hands every intermediate between stages through
disk (``/root/reference/nellie/run.py:56-115``), so each stage re-reads
its inputs from memmaps.  On a bandwidth-limited host<->device link the
re-uploads dominate stage time — HuMomentTracking alone uploads ~50 MB
per bench frame (raw + frangi + distance, float32).

This cache lets a producing stage (the fused segmentation loop) leave
its per-frame device arrays alive in HBM for the consuming stage in the
same process.  Disk artifacts are still written — resume and per-stage
re-run semantics are unchanged; the cache is a pure transfer bypass.

* budget-bounded: ``put`` is a no-op once the budget is reached, so the
  first frames of a long movie win and later frames fall back to memmap
  uploads — strictly no worse than the uncached path.
* ``take`` pops: each consumer owns the frame's array after the handoff
  and HBM is released as the consuming loop advances.
* keyed by (artifact key, t) with the artifact keys of
  ``ImInfo.pipeline_paths`` plus ``"im"`` for the raw frame.
"""
from __future__ import annotations

import numpy as np

DEFAULT_BUDGET_BYTES = int(2.5e9)


class DeviceFrameCache:
    """(key, t) -> device array store with a byte budget."""

    def __init__(self, budget_bytes: int = DEFAULT_BUDGET_BYTES):
        self.budget = int(budget_bytes)
        self.used = 0
        self._store = {}

    @staticmethod
    def _nbytes(arr) -> int:
        return int(np.prod(arr.shape)) * np.dtype(arr.dtype).itemsize

    def put(self, key: str, t: int, arr) -> bool:
        """Record ``arr`` for (key, t); False (and drop) when over budget."""
        k = (key, int(t))
        if k in self._store:
            return True
        nb = self._nbytes(arr)
        if self.used + nb > self.budget:
            return False
        self._store[k] = (arr, nb)
        self.used += nb
        return True

    def take(self, key: str, t: int):
        """Pop and return the array for (key, t), or None."""
        ent = self._store.pop((key, int(t)), None)
        if ent is None:
            return None
        self.used -= ent[1]
        return ent[0]

    def get(self, key: str, t: int):
        ent = self._store.get((key, int(t)))
        return None if ent is None else ent[0]

    def clear(self):
        self._store.clear()
        self.used = 0

    def __len__(self):
        return len(self._store)


def frame_cache(im_info, create: bool = False) -> DeviceFrameCache | None:
    """The per-ImInfo cache (attached lazily so ImInfo stays pickleable
    until a stage actually produces device arrays)."""
    cache = getattr(im_info, "_device_frame_cache", None)
    if cache is None and create:
        cache = DeviceFrameCache()
        im_info._device_frame_cache = cache
    return cache
