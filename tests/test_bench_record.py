"""bench.py record-assembly helpers (no device work).

The driver's BENCH_r{N}.json is the round's official perf record; these
tests pin the pure-Python pieces that decide WHAT lands in it — the
persisted-floor fallback ratio (used when the fresh CPU floor phase is
env-skipped or dies mid-run) and its provenance labelling.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_persisted_floor_fills_missing_ratio():
    record = {
        "e2e_s_per_frame": 2.0,
        "e2e_stage_s_per_frame": {
            "seg_fused": 1.0, "tracking": 0.1, "reassign": 0.3,
            "hierarchy": 0.6},
    }
    bench._ratio_from_persisted_floor(record, tunnel_down=False)
    # BASELINE.json "published" floor is 65.31 s/frame
    assert record["e2e_vs_cpu"] == round(65.31 / 2.0, 1)
    assert record["e2e_cpu_floor_source"] == "persisted (BASELINE.json)"
    stages = record["vs_cpu_per_stage"]
    # persisted per-stage floors: filter+label+network+markers = 56.8
    assert stages["segmentation"] == 56.8
    assert stages["reassign"] == round(1.06 / 0.3, 1)


def test_persisted_floor_never_overwrites_fresh_ratio():
    record = {"e2e_s_per_frame": 2.0, "e2e_vs_cpu": 31.3}
    bench._ratio_from_persisted_floor(record, tunnel_down=False)
    assert record["e2e_vs_cpu"] == 31.3
    assert "e2e_cpu_floor_source" not in record


def test_persisted_floor_respects_cpu_fallback_labelling():
    record = {"e2e_s_per_frame": 10.0}
    bench._ratio_from_persisted_floor(record, tunnel_down=True)
    assert "e2e_vs_cpu" not in record
    assert record["e2e_vs_cpu_cpu_fallback"] == round(65.31 / 10.0, 1)


def test_persisted_floor_noop_without_e2e():
    record = {}
    bench._ratio_from_persisted_floor(record, tunnel_down=False)
    assert record == {}
