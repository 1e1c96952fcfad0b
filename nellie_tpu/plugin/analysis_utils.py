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


def hierarchy_lookup(pos, label_coords, dfs, adjacency, no_z):
    """Map a viewer cursor position to the hierarchy rows containing that
    voxel (the reference's click->index table, ``nellie_analysis.py:759``).

    pos: cursor position (t, [z,] y, x) in data coordinates.
    label_coords: per-frame (N, ndim) foreground coords in the voxel-CSV
        row order (argwhere order).
    dfs: {level: DataFrame}; adjacency: {edge_key: [per-t (M, 2) edges]}.

    Returns ``(coord_str, headers, values)`` or ``None`` when the click
    missed the foreground / data isn't loaded.
    """
    import numpy as np

    if not label_coords:
        return None
    want = 3 if no_z else 4
    if len(pos) < want:
        return None
    ints = [int(round(float(p))) for p in pos[:want]]
    t, spatial = ints[0], ints[1:]
    if t < 0 or t >= len(label_coords):
        return None
    t_coords = label_coords[t]
    if t_coords is None or len(t_coords) == 0 or t_coords.shape[1] != len(spatial):
        return None
    match = np.nonzero((t_coords == np.asarray(spatial)).all(axis=1))[0]
    if len(match) == 0:
        return None
    matched_row = int(match[0])

    def _slice(level):
        df = dfs.get(level)
        if df is None:
            return None
        return df[df["t"] == t] if "t" in df.columns else df

    headers, values = [], []
    vox_slice = _slice("voxel")
    if vox_slice is not None and 0 <= matched_row < len(vox_slice):
        headers.append("Voxel")
        values.append(str(vox_slice.iloc[matched_row, 0]))

    def _members(edge_key, level, by_label=False):
        if adjacency is None or edge_key not in adjacency:
            return None
        per_t = adjacency[edge_key]
        if t >= len(per_t):
            return None
        edges = np.asarray(per_t[t])
        if edges.size == 0:
            return None
        rows = edges[edges[:, 0] == matched_row, 1]
        if len(rows) == 0:
            return None
        sl = _slice(level)
        if sl is None:
            return None
        if by_label:
            # member index is the component *label*; map via the label col
            label_col = sl["label"].to_numpy() if "label" in sl.columns else None
            if label_col is None:
                return None
            hits = [str(sl.iloc[i, 0]) for i, l in enumerate(label_col)
                    if int(l) in set(int(r) for r in rows)]
            return ", ".join(hits) if hits else None
        ids = [str(sl.iloc[int(r), 0]) for r in rows if 0 <= int(r) < len(sl)]
        return ", ".join(ids) if ids else None

    for edge_key, level, title, by_label in (
            ("v_n", "node", "Nodes", False),
            ("v_b", "branch", "Branch", False),
            ("v_o", "organelle", "Organelle", True)):
        got = _members(edge_key, level, by_label)
        if got:
            headers.append(title)
            values.append(got)

    img_slice = _slice("image")
    if img_slice is not None and len(img_slice) > 0:
        headers.append("Image")
        values.append(str(img_slice.iloc[0, 0]))

    if not headers:
        return None
    coord_str = (f"(t={t}, y={spatial[0]}, x={spatial[1]})" if no_z
                 else f"(t={t}, z={spatial[0]}, y={spatial[1]}, x={spatial[2]})")
    return coord_str, headers, values
