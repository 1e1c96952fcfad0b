"""Independent numpy implementation of the reference's hierarchy feature
formulas (``/root/reference/nellie/feature_extraction/hierarchical.py``)
— the features-CSV oracle.

Given the pipeline's *input artifacts* for one frame (instance labels,
branch labels, skeleton, pixel classes, distance, border, raw/frangi
intensities, interpolated flow vectors), produce per-level feature
tables with the same column meanings as the product's CSVs:

* voxels     — motility bundle (linear/angular velocity & acceleration,
               branch-relative variants, directionality;
               hierarchical.py:861-1061) + intensity/structure
* nodes      — divergence/convergence/vergere (flow dotted with the
               direction to each skeleton voxel, :1323-1393), thickness
               (2x distance to nearest border voxel, :1432-1441), and
               nan-aware aggregations of member-voxel stats (radius-box
               membership, :743-801)
* branches   — centerline length with tip corrections, median
               thickness, aspect, tortuosity (:1641-1750), region
               morphology (area/axis lengths/extent/solidity, :1757-1804)
* organelles — region morphology + aggregations of lower levels
* image      — whole-frame aggregations

Everything here is plain numpy/scipy written from the formula
definitions — no nellie_tpu imports — so agreement is a genuine
cross-implementation check (tolerance: rtol 1e-4, NaN-equal; see
algos.py's policy table).
"""
from __future__ import annotations

import numpy as np

STAT_KEYS = ("mean", "std_dev", "min", "max", "sum")


def nanstats(values: np.ndarray, group_ids: np.ndarray, n_groups: int) -> dict:
    """Per-group nan-aware mean/std(population)/min/max/sum of each row of
    ``values`` (S, N); group_ids < 0 don't contribute; empty -> NaN."""
    values = np.atleast_2d(np.asarray(values, np.float64))
    s = values.shape[0]
    out = {k: np.full((s, n_groups), np.nan) for k in STAT_KEYS}
    gid = np.asarray(group_ids)
    for g in range(n_groups):
        sel = gid == g
        if not sel.any():
            continue
        v = values[:, sel]
        with np.errstate(invalid="ignore"):
            any_ok = (~np.isnan(v)).any(axis=1)
            for key, fn in (("mean", np.nanmean), ("std_dev", np.nanstd),
                            ("min", np.nanmin), ("max", np.nanmax),
                            ("sum", np.nansum)):
                col = np.full(s, np.nan)
                if any_ok.any():
                    col[any_ok] = fn(v[any_ok], axis=1)
                out[key][:, g] = col
    return out


# ---------------------------------------------------------------------------
# voxel level
# ---------------------------------------------------------------------------

def motility_features(coords, vec01, vec12, branch_labels, spacing, dt, no_z):
    """Reference hierarchical.py:861-1061. coords (N, d) voxel units;
    vec01/vec12 (N, d) voxel-unit flow (NaN where undefined); spacing (d,).
    Returns dict of (N,) columns."""
    coords = np.asarray(coords, np.float64)
    spacing = np.asarray(spacing, np.float64)
    n, d = coords.shape
    nanc = lambda: np.full(n, np.nan)  # noqa: E731

    r1 = coords * spacing
    out = {}

    def lin(ra, rb):
        v = (rb - ra) / dt
        return v, np.linalg.norm(v, axis=1)

    def ang(ra, rb):
        if no_z:
            ta = np.arctan2(ra[:, 1], ra[:, 0])
            tb = np.arctan2(rb[:, 1], rb[:, 0])
            delta = (tb - ta + np.pi) % (2 * np.pi) - np.pi
            av = delta / dt
            return av, np.abs(av)
        cross = np.cross(ra, rb)
        norm = np.linalg.norm(ra, axis=1) * np.linalg.norm(rb, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            disp = np.where(norm[:, None] != 0, cross / np.where(norm[:, None] != 0, norm[:, None], 1.0), np.nan)
        av = disp / dt
        return av, np.linalg.norm(av, axis=1)

    def ref_voxel_rel(vec_px, vec_phys, ca, cb):
        """Positions relative to the branch's reference voxel — the member
        of minimum |flow| (hierarchical.py:861-913); ties -> first index.

        The pick is a *discrete* argmin over near-tied magnitudes, so it
        is evaluated in the product's working precision and operation
        order (float32 voxel-vector x float32 spacing) — same policy as
        the "identical match set" row for flow matching; the feature
        *values* stay float64."""
        euc = np.linalg.norm(
            np.asarray(vec_px, np.float32) * spacing.astype(np.float32), axis=1)
        ra = np.full_like(ca, np.nan)
        rb = np.full_like(cb, np.nan)
        for lbl in np.unique(branch_labels):
            if lbl < 0:
                continue
            sel = branch_labels == lbl
            e = euc[sel]
            if np.isnan(e).all():
                continue
            ref_local = np.nanargmin(e)
            ref_global = np.nonzero(sel)[0][ref_local]
            ra[sel] = ca[sel] - ca[ref_global]
            rb[sel] = cb[sel] - cb[ref_global]
        bad = np.isnan(vec_phys)
        ra[bad] = np.nan
        rb[bad] = np.nan
        return ra, rb

    has12 = vec12 is not None and not np.isnan(vec12).all()
    if not has12:
        for k in ("linear_vel", "angular_vel", "linear_acc", "angular_acc",
                  "rel_linear_vel", "rel_angular_vel", "rel_linear_acc",
                  "rel_angular_acc", "rel_directionality"):
            out[k] = nanc()
        return out

    v12 = np.asarray(vec12, np.float64) * spacing
    r2 = (coords + vec12) * spacing
    lin_v, out["linear_vel"] = lin(r1, r2)
    ang_v, out["angular_vel"] = ang(r1, r2)
    r1_rel, r2_rel = ref_voxel_rel(vec12, v12, r1, r2)
    lin_vr, out["rel_linear_vel"] = lin(r1_rel, r2_rel)
    ang_vr, out["rel_angular_vel"] = ang(r1_rel, r2_rel)
    r1m = np.linalg.norm(r1_rel, axis=1)
    r2m = np.linalg.norm(r2_rel, axis=1)
    denom = r2m + r1m
    with np.errstate(invalid="ignore", divide="ignore"):
        out["rel_directionality"] = np.where(
            denom != 0, np.abs(r2m - r1m) / np.where(denom != 0, denom, 1.0), np.nan)

    has01 = vec01 is not None and not np.isnan(vec01).all()
    if has01:
        v01 = np.asarray(vec01, np.float64) * spacing
        r0 = (coords - vec01) * spacing
        lin_v01, _ = lin(r0, r1)
        ang_v01, _ = ang(r0, r1)
        r0_rel, r1_rel01 = ref_voxel_rel(vec01, v01, r0, r1)
        lin_vr01, _ = lin(r0_rel, r1_rel01)
        ang_vr01, _ = ang(r0_rel, r1_rel01)
        out["linear_acc"] = np.linalg.norm((lin_v - lin_v01) / dt, axis=1)
        out["rel_linear_acc"] = np.linalg.norm((lin_vr - lin_vr01) / dt, axis=1)
        aa = (ang_v - ang_v01) / dt
        aar = (ang_vr - ang_vr01) / dt
        if no_z:
            out["angular_acc"] = np.abs(aa)
            out["rel_angular_acc"] = np.abs(aar)
        else:
            out["angular_acc"] = np.linalg.norm(aa, axis=1)
            out["rel_angular_acc"] = np.linalg.norm(aar, axis=1)
    else:
        out["linear_acc"] = nanc()
        out["angular_acc"] = nanc()
        out["rel_linear_acc"] = nanc()
        out["rel_angular_acc"] = nanc()
    return out


# ---------------------------------------------------------------------------
# node level
# ---------------------------------------------------------------------------

def node_features(nodes, node_radius, vox_coords, vec01, vec12, border_mask,
                  spacing, shape):
    """Per-skeleton-voxel features (hierarchical.py:1275-1441): radius-box
    membership pairs, convergence/divergence/vergere, thickness."""
    nodes = np.asarray(nodes)
    m, d = nodes.shape
    lo = np.empty((m, d), int)
    hi = np.empty((m, d), int)
    for dim in range(d):
        lo[:, dim] = np.clip((nodes[:, dim] - node_radius).astype(int), 0, shape[dim])
        hi[:, dim] = np.clip((nodes[:, dim] + node_radius).astype(int) + 1, 0, shape[dim])

    conv = np.full(m, np.nan)
    div = np.full(m, np.nan)
    pair_node, pair_vox = [], []
    for i in range(m):
        inside = np.ones(len(vox_coords), bool)
        for dim in range(d):
            inside &= (lo[i, dim] <= vox_coords[:, dim]) & (vox_coords[:, dim] <= hi[i, dim])
        members = np.nonzero(inside)[0]
        pair_node.append(np.full(len(members), i))
        pair_vox.append(members)
        if not len(members):
            continue
        dvec = (vox_coords[members] - nodes[i]).astype(float)
        mag = np.linalg.norm(dvec, axis=1, keepdims=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            direction = np.where(mag != 0, dvec / np.where(mag != 0, mag, 1.0), np.nan)
        with np.errstate(invalid="ignore"):
            d01 = np.sum(vec01[members] * direction, axis=1) if vec01 is not None else np.full(len(members), np.nan)
            d12 = np.sum(vec12[members] * direction, axis=1) if vec12 is not None else np.full(len(members), np.nan)
            conv[i] = np.nanmean(d01) if not np.isnan(d01).all() else np.nan
            div[i] = np.nanmean(d12) if not np.isnan(d12).all() else np.nan

    border_coords = np.argwhere(border_mask)
    sp = np.asarray(spacing, float)
    if len(border_coords):
        # cKDTree, like the reference's distance_check (hierarchical.py:1432)
        from scipy.spatial import cKDTree

        dist, _ = cKDTree(border_coords * sp).query(nodes * sp)
        thick = 2.0 * dist
    else:
        thick = np.full(m, np.nan)
    return {
        "convergence": conv, "divergence": div, "vergere": conv + div,
        "node_thickness": thick,
        "pair_node": np.concatenate(pair_node) if pair_node else np.zeros(0, int),
        "pair_vox": np.concatenate(pair_vox) if pair_vox else np.zeros(0, int),
    }


# ---------------------------------------------------------------------------
# branch / region morphology
# ---------------------------------------------------------------------------

def _hull_extreme_candidates(coords):
    """Exact hull-candidate reduction: any voxel strictly between its
    row's min/max along the last axis is a convex combination of the two
    extremes, so the hull of the extremes equals the hull of the set."""
    lead, x = coords[:, :-1], coords[:, -1]
    dims = lead.max(axis=0) + 1
    key = np.ravel_multi_index(tuple(lead.T), tuple(dims))
    order = np.argsort(key, kind="stable")
    ks, xs = key[order], x[order]
    first = np.ones(len(ks), bool)
    first[1:] = ks[1:] != ks[:-1]
    starts = np.nonzero(first)[0]
    ends = np.append(starts[1:], len(ks))
    mn = np.minimum.reduceat(xs, starts)
    mx = np.maximum.reduceat(xs, starts)
    rows = np.column_stack(np.unravel_index(ks[starts], tuple(dims)))
    lo = np.column_stack([rows, mn])
    hi = np.column_stack([rows, mx])
    return np.concatenate([lo, hi[mn != mx]])


def _solidity_delaunay(coords):
    """Voxel count / convex-image count via scipy Delaunay membership —
    independent of the product's quickhull/Qhull half-space counting."""
    from scipy.spatial import Delaunay, QhullError

    coords = np.asarray(coords, float)
    n_voxels = len(coords)
    if n_voxels <= coords.shape[1] + 1:
        return 1.0
    hull_pts = _hull_extreme_candidates(coords.astype(int)) if n_voxels > 64 else coords
    try:
        tri = Delaunay(hull_pts)
    except (QhullError, ValueError):
        return np.nan
    mins = coords.min(axis=0).astype(int)
    maxs = coords.max(axis=0).astype(int)
    grid = np.stack(np.meshgrid(
        *[np.arange(mn, mx + 1) for mn, mx in zip(mins, maxs)],
        indexing="ij"), axis=-1).reshape(-1, coords.shape[1])
    inside = tri.find_simplex(grid) >= 0
    hull_count = int(inside.sum())
    return n_voxels / hull_count if hull_count else np.nan


def region_morphology(label_image, spacing, compute_solidity=True):
    """area / centroid / axis lengths / extent / solidity per label
    (skimage regionprops definitions; hierarchical.py:1757-1804)."""
    label_image = np.asarray(label_image)
    spacing = np.asarray(spacing, float)
    all_coords = np.argwhere(label_image > 0)
    all_labels = label_image[tuple(all_coords.T)]
    order = np.argsort(all_labels, kind="stable")
    all_coords, all_labels = all_coords[order], all_labels[order]
    labels = np.unique(all_labels)
    starts = np.searchsorted(all_labels, labels)
    ends = np.searchsorted(all_labels, labels, side="right")
    rows = {}
    vol = float(np.prod(spacing))
    for k, lbl in enumerate(labels):
        coords = all_coords[starts[k]:ends[k]]
        n = len(coords)
        phys = coords * spacing
        mean = phys.mean(axis=0)
        cov = (phys - mean).T @ (phys - mean) / n
        ev = np.sort(np.maximum(np.linalg.eigvalsh(cov), 0.0))
        if label_image.ndim == 2:
            maj, mino = 4 * np.sqrt(ev[-1]), 4 * np.sqrt(ev[0])
        else:
            maj, mino = np.sqrt(20 * ev[-1]), np.sqrt(20 * ev[0])
        bbox = coords.max(axis=0) - coords.min(axis=0) + 1
        rows[int(lbl)] = {
            "area": n * vol,
            "centroid": tuple(mean),
            "major_axis_length": maj,
            "minor_axis_length": mino,
            "extent": n / float(np.prod(bbox)),
            "solidity": _solidity_delaunay(coords) if compute_solidity else np.nan,
        }
    return rows


def branch_stats(skel_labels, border_mask, spacing, label_branches):
    """Branch length (half-offset sweep + tip radius corrections), median
    thickness, aspect, tortuosity (hierarchical.py:1641-1750)."""
    import itertools

    from .algos import branch_length_reference

    skel = np.asarray(skel_labels)
    spacing = np.asarray(spacing, float)
    labels = np.unique(skel[skel > 0])
    lengths_all = branch_length_reference(skel, spacing)

    # same-label neighbour degree
    degree = np.zeros(skel.shape, int)
    for off in itertools.product((-1, 0, 1), repeat=skel.ndim):
        if off == (0,) * skel.ndim:
            continue
        src = tuple(slice(max(0, o), skel.shape[a] + min(0, o)) for a, o in enumerate(off))
        dst = tuple(slice(max(0, -o), skel.shape[a] - max(0, o)) for a, o in enumerate(off))
        same = (skel[dst] > 0) & (skel[dst] == skel[src])
        degree[dst] += same  # over all 26 offsets: same-label neighbour count

    border_coords = np.argwhere(border_mask) * spacing
    tree = None
    if len(border_coords):
        from scipy.spatial import cKDTree

        tree = cKDTree(border_coords)
    out = {}
    for lbl in labels:
        coords = np.argwhere(skel == lbl)
        deg = degree[tuple(coords.T)]
        if tree is not None:
            radii, _ = tree.query(coords * spacing)
        else:
            radii = np.full(len(coords), np.nan)
        length = lengths_all[int(lbl)]
        length += 2.0 * radii[deg == 0].sum() + radii[deg == 1].sum()
        thickness = np.median(radii * 2.0) if len(radii) else np.nan
        if not np.isnan(thickness) and thickness > length:
            thickness, length = length, thickness
        aspect = length / thickness if thickness else np.nan
        tips = coords[deg == 1]
        tortuosity = 1.0
        if len(tips) >= 2:
            tip_dist = np.linalg.norm((tips[0] - tips[1]) * spacing)
            if tip_dist > 0:
                tortuosity = length / tip_dist
        out[int(lbl)] = {
            "branch_length": length, "branch_thickness": thickness,
            "branch_aspect_ratio": aspect, "branch_tortuosity": tortuosity,
        }
    return out
