"""Measure the 1024^3 capacity path on the real TPU (BASELINE config #4).

Generates a synthetic uint16 lightsheet-like volume (vessel tubes on a
noisy background), runs ``pipeline.capacity.segment_volume`` with the
sparse-labels emit, and prints one JSON line with Mvox/s and the
audited bytes_up/bytes_down so link-boundedness is checkable.

Usage:  python scripts/measure_capacity_1024.py [--edge 1024] [--emit sparse_labels]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_volume(edge: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    vol = rng.normal(100.0, 8.0, (edge, edge, edge)).astype(np.float32)
    # ~40 bright tubes along random axes, drawn block-sparsely so the
    # generator stays fast at gigavoxel scale
    n_tubes = max(8, edge // 25)
    for _ in range(n_tubes):
        axis = rng.integers(0, 3)
        c = rng.integers(8, edge - 8, size=2)
        r = int(rng.integers(2, 4))
        lo, hi = sorted(rng.integers(0, edge, size=2))
        if hi - lo < edge // 8:
            hi = min(edge, lo + edge // 8)
        sl = [slice(int(c[0]) - r, int(c[0]) + r + 1),
              slice(int(c[1]) - r, int(c[1]) + r + 1)]
        sl.insert(axis, slice(lo, hi))
        vol[tuple(sl)] += 400.0
    return np.clip(vol, 0, 65535).astype(np.uint16)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edge", type=int, default=1024)
    ap.add_argument("--emit", default="sparse_labels",
                    choices=["labels", "sparse_labels", "mask"])
    args = ap.parse_args()

    from nellie_tpu.kernels import frangi as frangi_k
    from nellie_tpu.pipeline import capacity

    t0 = time.perf_counter()
    vol = make_volume(args.edge)
    gen_s = time.perf_counter() - t0
    params = frangi_k.FrangiParams(
        sigmas=(0.75, 1.1, 1.6), spacing=(1.0, 1.0, 1.0), z_ratio=1.0)

    t1 = time.perf_counter()
    out = capacity.segment_volume(vol, params, emit=args.emit)
    seg_s = time.perf_counter() - t1

    nvox = vol.size
    rec = {
        "metric": f"capacity segment {args.edge}^3 ({args.emit})",
        "value": round(nvox / seg_s / 1e6, 2),
        "unit": "Mvox/s",
        "seconds": round(seg_s, 1),
        "gen_seconds": round(gen_s, 1),
        "bytes_up_gb": round(out["bytes_up"] / 1e9, 3),
        "bytes_down_gb": round(out["bytes_down"] / 1e9, 3),
        "n_labels": out.get("n_labels"),
        "fg_count": out.get("fg_count"),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
