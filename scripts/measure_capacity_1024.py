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
    """Synthetic lightsheet-like volume, generated slab-wise straight
    into the uint16 result buffer: peak host memory is the 2.1 GB output
    plus one float32 slab (~34 MB), not 3 full-volume temporaries
    (ADVICE r3: the old full-float32 path transiently held ~10.7 GB)."""
    rng = np.random.default_rng(seed)
    # ~40 bright tubes along random axes, materialised per-slab below
    n_tubes = max(8, edge // 25)
    tubes = []
    for _ in range(n_tubes):
        axis = int(rng.integers(0, 3))
        c = rng.integers(8, edge - 8, size=2)
        r = int(rng.integers(2, 4))
        lo, hi = sorted(int(v) for v in rng.integers(0, edge, size=2))
        if hi - lo < edge // 8:
            hi = min(edge, lo + edge // 8)
        sl = [slice(int(c[0]) - r, int(c[0]) + r + 1),
              slice(int(c[1]) - r, int(c[1]) + r + 1)]
        sl.insert(axis, slice(lo, hi))
        tubes.append(tuple(sl))

    out = np.empty((edge, edge, edge), np.uint16)
    slab = 8
    for z0 in range(0, edge, slab):
        z1 = min(z0 + slab, edge)
        block = rng.normal(100.0, 8.0, (z1 - z0, edge, edge)).astype(np.float32)
        for sl in tubes:
            zs = sl[0]
            izlo, izhi = max(zs.start, z0), min(zs.stop, z1)
            if izlo < izhi:
                block[izlo - z0:izhi - z0, sl[1], sl[2]] += 400.0
        np.clip(block, 0, 65535, out=block)
        out[z0:z1] = block.astype(np.uint16)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edge", type=int, default=1024)
    ap.add_argument("--emit", default="sparse_labels",
                    choices=["labels", "sparse_labels", "mask"])
    ap.add_argument("--cold-only", action="store_true",
                    help="skip the second (warm, compile-free) run")
    args = ap.parse_args()

    from nellie_tpu.kernels import frangi as frangi_k
    from nellie_tpu.pipeline import capacity

    t0 = time.perf_counter()
    vol = make_volume(args.edge)
    gen_s = time.perf_counter() - t0
    params = frangi_k.FrangiParams(
        sigmas=(0.75, 1.1, 1.6), spacing=(1.0, 1.0, 1.0), z_ratio=1.0)

    # Per-cell programs are shape-bound to the full volume (the HBM
    # buffers appear in every program signature), so no small-volume
    # warmup can pre-compile them.  Instead: run the target volume
    # twice in one process — the first (cold) run pays every compile,
    # the second is pure steady-state.  Headline = warm throughput,
    # with the cold wall-clock recorded alongside (ADVICE r3).
    t1 = time.perf_counter()
    out = capacity.segment_volume(vol, params, emit=args.emit)
    cold_s = time.perf_counter() - t1
    print(f"[capacity] cold run ({out.get('strategy')}): {cold_s:.1f}s",
          file=sys.stderr)

    seg_s = cold_s
    if not args.cold_only:
        t2 = time.perf_counter()
        out = capacity.segment_volume(vol, params, emit=args.emit)
        seg_s = time.perf_counter() - t2

    nvox = vol.size
    rec = {
        "metric": f"capacity segment {args.edge}^3 ({args.emit})",
        "value": round(nvox / seg_s / 1e6, 2),
        "unit": "Mvox/s",
        "seconds": round(seg_s, 1),
        "cold_seconds": round(cold_s, 1),
        "gen_seconds": round(gen_s, 1),
        "strategy": out.get("strategy"),
        # what actually ran: sparse capacity overflow silently falls back
        # to the dense emit inside segment_volume (ADVICE r3)
        "effective_emit": out.get("emit", args.emit),
        "bytes_up_gb": round(out["bytes_up"] / 1e9, 3),
        "bytes_down_gb": round(out["bytes_down"] / 1e9, 3),
        "n_labels": out.get("n_labels"),
        "fg_count": out.get("fg_count"),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
