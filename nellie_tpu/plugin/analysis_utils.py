"""Qt-free helpers for the Analyze tab (testable headlessly)."""
from __future__ import annotations

LEVELS = ["voxel", "node", "branch", "organelle", "image"]
LEVEL_TO_CSV = {
    "voxel": "features_voxels",
    "node": "features_nodes",
    "branch": "features_branches",
    "organelle": "features_organelles",
    "image": "features_image",
}
STAT_SUFFIXES = ["raw", "mean", "std_dev", "min", "max", "sum"]


def split_feature_columns(columns):
    """Header grammar: '<feature>_<stat>' -> {feature: [stats]}
    (the reference's suffix table, ``nellie_analysis.py:34-65,427``)."""
    features = {}
    for col in columns:
        if col in ("t", "label"):
            continue
        for suffix in STAT_SUFFIXES:
            if col.endswith("_" + suffix):
                feature = col[: -(len(suffix) + 1)]
                features.setdefault(feature, []).append(suffix)
                break
    return features
