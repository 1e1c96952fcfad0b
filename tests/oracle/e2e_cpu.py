"""Full seven-stage CPU reference pipeline (numpy/scipy) — the
end-to-end denominator for bench.py's ``e2e_vs_cpu`` ratio
(VERDICT r3 directive #3).

This chains the per-stage oracle algorithms (``algos.py``) with
vectorised numpy/scipy implementations of the pieces they did not yet
cover (3D thinning, branch-label EDT propagation, LoG markers, ROI Hu
features, flow voting, hierarchy features) into one driver with the
reference's CPU implementation class: scipy C primitives
(gaussian_filter, EDT, cKDTree, label) plus vectorised numpy — the same
technology the reference pipeline runs on
(``/root/reference/nellie/run.py:54-128``, numpy/scipy/skimage).

It is used two ways:
* ``run_cpu_reference``: timed on the bench dataset to produce the CPU
  floor (per-stage seconds) that the TPU e2e number divides against
* its stages double as additional cross-checks for stage parity tests
"""
from __future__ import annotations

import time

import numpy as np
import scipy.ndimage as ndi

from .algos import (
    border_reference,
    dense_match_reference,
    distance_reference,
    flow_interp_reference,
    frangi_reference,
    label_reference,
    pixel_class_reference,
)

# --------------------------------------------------------------------------
# 3D thinning (vectorised numpy: packed-neighbourhood LUT, 6 subiterations)
# --------------------------------------------------------------------------

_OFFSETS_26 = [(dz, dy, dx)
               for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
               if (dz, dy, dx) != (0, 0, 0)]


def _shift_np(x, off):
    out = x
    for axis, o in enumerate(off):
        if o:
            out = np.roll(out, -o, axis=axis)
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(-o, None) if o > 0 else slice(None, -o)
            out[tuple(sl)] = 0
    return out


def _lut():
    from nellie_tpu.kernels.simple_point import OFFSETS_26, get_simple26_lut

    assert tuple(OFFSETS_26) == tuple(_OFFSETS_26)
    return get_simple26_lut()


def _pack26_np(fg):
    code = np.zeros(fg.shape, np.int32)
    for k, off in enumerate(_OFFSETS_26):
        code |= _shift_np(fg, off).astype(np.int32) << k
    return code


def _deletable_np(fg, lut, where):
    code = _pack26_np(fg)
    sel = fg & where
    code = np.where(sel, code, 0)
    byte = lut[code >> 3]
    return ((byte >> (code & 7).astype(np.uint8)) & 1).astype(bool) & sel


_DIRECTIONS = ((-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1))


def skeletonize_3d_np(mask):
    """Parallel LUT thinning, same subiteration/parity-commit scheme as
    the product's ``kernels.skeleton.skeletonize_3d`` but in vectorised
    numpy — the CPU-reference implementation class."""
    lut = _lut()
    fg = np.asarray(mask, bool).copy()
    iz, iy, ix = np.indices(fg.shape)
    parity = (iz % 2) * 4 + (iy % 2) * 2 + (ix % 2)
    changed = True
    while changed:
        changed = False
        for d in _DIRECTIONS:
            border = fg & ~_shift_np(fg, d)
            remaining = _deletable_np(fg, lut, border)
            while remaining.any():
                del_now = _deletable_np(fg, lut, remaining)
                if not del_now.any():
                    break
                blocked = np.zeros_like(del_now)
                for off in _OFFSETS_26:
                    flip = ((abs(off[0]) % 2) << 2) | ((abs(off[1]) % 2) << 1) | (abs(off[2]) % 2)
                    nb = _shift_np(del_now, off)
                    blocked |= nb & ((parity ^ flip) < parity)
                commit = del_now & ~blocked
                if not commit.any():
                    break
                fg &= ~commit
                remaining = del_now & ~commit
                changed = True
    return fg


def network_reference(labels, frangi, spacing):
    """Skeleton / pixel classes / branch labels (networking.py:828-902)."""
    mask = labels > 0
    skel_mask = skeletonize_3d_np(mask) if labels.ndim == 3 else _skeletonize_2d_np(mask)
    skel = np.where(skel_mask, labels, 0)

    # drop skeleton voxels whose 3^3 neighbourhood spans >1 label
    max_l = ndi.maximum_filter(labels, 3, mode="constant", cval=0)
    big = labels.max() + 1
    no_bg = np.where(labels == 0, big, labels)
    min_l = ndi.minimum_filter(no_bg, 3, mode="constant", cval=np.iinfo(np.int32).max)
    min_l = np.where(min_l == big, 0, min_l)
    ambiguous = (skel > 0) & (min_l > 0) & (max_l > 0) & (min_l != max_l)
    boundary = np.zeros(labels.shape, bool)
    for axis in range(labels.ndim):
        sl = [slice(None)] * labels.ndim
        sl[axis] = 0
        boundary[tuple(sl)] = True
        sl[axis] = -1
        boundary[tuple(sl)] = True
    skel = np.where(ambiguous & ~boundary, 0, skel)

    # every label keeps >= 1 skeleton voxel (frangi argmax)
    have = np.unique(skel[skel > 0])
    want = np.unique(labels[labels > 0])
    for lbl in np.setdiff1d(want, have):
        sel = labels == lbl
        pos = np.unravel_index(np.argmax(np.where(sel, frangi, -np.inf)), labels.shape)
        skel[pos] = lbl

    pixel_class = pixel_class_reference(skel)
    non_junction = (pixel_class > 0) & (pixel_class != 4)
    branch_skel, _ = ndi.label(non_junction, structure=np.ones((3,) * labels.ndim))

    # branch labels propagated to whole objects: per-object EDT to the
    # nearest skeleton seed (networking.py:485-577)
    relabel = np.zeros(labels.shape, np.int32)
    for lbl in want:
        sel = labels == lbl
        bb = tuple(slice(int(a.min()), int(a.max()) + 1) for a in np.nonzero(sel))
        sub_sel = sel[bb]
        seeds = np.where(sub_sel, branch_skel[bb], 0)
        if not (seeds > 0).any():
            continue
        _, idx = ndi.distance_transform_edt(seeds == 0, sampling=spacing,
                                            return_indices=True)
        relabel[bb] = np.where(sub_sel, seeds[tuple(idx)], relabel[bb])
    return np.where(skel > 0, branch_skel, 0).astype(np.int32), pixel_class, relabel


def _skeletonize_2d_np(mask):
    fg = np.asarray(mask, bool).copy()
    offs = ((-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1))

    def zs_pass(fg, first):
        p = [_shift_np(fg, o).astype(int) for o in offs]
        b = sum(p)
        seq = p + [p[0]]
        a = sum(((seq[i] == 0) & (seq[i + 1] == 1)) for i in range(8))
        p2, p4, p6, p8 = p[0], p[2], p[4], p[6]
        c1 = (p2 * p4 * p6 == 0) if first else (p2 * p4 * p8 == 0)
        c2 = (p4 * p6 * p8 == 0) if first else (p2 * p6 * p8 == 0)
        return fg & ~(fg & (b >= 2) & (b <= 6) & (a == 1) & c1 & c2)

    while True:
        new = zs_pass(zs_pass(fg, True), False)
        if (new == fg).all():
            return fg
        fg = new


# --------------------------------------------------------------------------
# markers / tracking / reassignment
# --------------------------------------------------------------------------

def markers_reference(intensity, labels, spacing, min_radius_um=0.20,
                      max_radius_um=1.0, num_sigma=5, peak_min_distance=2):
    """Distance/border/LoG peak markers (mocap_marking.py:329-606)."""
    x_res = spacing[-1]
    min_r_px = max(min_radius_um, x_res) / x_res
    max_r_px = max_radius_um / x_res
    z_ratio = spacing[0] / x_res if len(spacing) == 3 else 1.0

    mask = labels > 0
    distance = distance_reference(mask, clamp=max_r_px * 2.0)
    border = border_reference(mask)

    s_min, s_max = min_r_px / 2.0, max_r_px / 3.0
    rng = s_max - s_min
    step = max(0.2, rng / max(num_sigma, 1)) if rng > 0 else 1.0
    sigmas = list(np.arange(s_min, s_max, step)) or [s_min]

    valid = mask & (distance > 0)
    best = np.zeros(mask.shape)
    peaks = np.zeros(mask.shape, bool)
    for s in sigmas:
        vec = (s / z_ratio, s, s) if mask.ndim == 3 else (s, s)
        resp = np.maximum(-ndi.gaussian_laplace(distance.astype(float), vec) * s ** 2, 0.0)
        local_max = (resp == ndi.maximum_filter(resp, 3)) & valid
        better = local_max & (resp > best)
        peaks |= better
        best = np.where(better, resp, best)
    score = np.where(peaks, intensity.astype(float), 0.0)
    keep = (score == ndi.maximum_filter(score, 2 * peak_min_distance + 1)) & (score > 0)
    return keep.astype(np.uint8), distance, border


def _roi_hu_features(intensity, frangi, distance, marker, spacing):
    """Stats + log-Hu features per marker (hu_tracking.py:585-684):
    log-normalised frangi, 2x dilated distance radii, zero-padded ROI
    cubes, orthogonal-projection Hu moments."""
    coords = np.argwhere(marker > 0)
    n = len(coords)
    d = intensity.ndim
    if n == 0:
        return coords, np.zeros((0, d)), np.zeros((0, 4)), np.zeros((0, 18 if d == 3 else 6))
    f = frangi.astype(np.float64)
    pos = f > 0
    f = np.where(pos, np.log10(np.where(pos, f, 1.0)), f)
    neg = f < 0
    if neg.any():
        f = np.where(neg, f - f[neg].min(), f)
    radii = (ndi.maximum_filter(distance, 3) * 2.0)[tuple(coords.T)]

    def hu6(im2d):
        m = {}
        ys, xs = np.mgrid[0:im2d.shape[0], 0:im2d.shape[1]]
        s = im2d.sum()
        if s == 0:
            return np.zeros(6)
        cy, cx = (im2d * ys).sum() / s, (im2d * xs).sum() / s
        for p in range(4):
            for q in range(4):
                if p + q <= 3:
                    m[(p, q)] = ((ys - cy) ** p * (xs - cx) ** q * im2d).sum()
        eta = {k: v / s ** (1 + (k[0] + k[1]) / 2) for k, v in m.items()}
        e = eta
        h = np.empty(6)
        h[0] = e[(2, 0)] + e[(0, 2)]
        h[1] = (e[(2, 0)] - e[(0, 2)]) ** 2 + 4 * e[(1, 1)] ** 2
        h[2] = (e[(3, 0)] - 3 * e[(1, 2)]) ** 2 + (3 * e[(2, 1)] - e[(0, 3)]) ** 2
        h[3] = (e[(3, 0)] + e[(1, 2)]) ** 2 + (e[(2, 1)] + e[(0, 3)]) ** 2
        h[4] = ((e[(3, 0)] - 3 * e[(1, 2)]) * (e[(3, 0)] + e[(1, 2)])
                * ((e[(3, 0)] + e[(1, 2)]) ** 2 - 3 * (e[(2, 1)] + e[(0, 3)]) ** 2)
                + (3 * e[(2, 1)] - e[(0, 3)]) * (e[(2, 1)] + e[(0, 3)])
                * (3 * (e[(3, 0)] + e[(1, 2)]) ** 2 - (e[(2, 1)] + e[(0, 3)]) ** 2))
        h[5] = ((e[(2, 0)] - e[(0, 2)]) * ((e[(3, 0)] + e[(1, 2)]) ** 2
                - (e[(2, 1)] + e[(0, 3)]) ** 2)
                + 4 * e[(1, 1)] * (e[(3, 0)] + e[(1, 2)]) * (e[(2, 1)] + e[(0, 3)]))
        return h

    stats = np.zeros((n, 4))
    hu = np.zeros((n, 18 if d == 3 else 6))
    for i, c in enumerate(coords):
        r = int(np.ceil(radii[i]))
        lo = np.maximum(c - r, 0)
        hi = np.minimum(c + r + 1, intensity.shape)
        sl = tuple(slice(a, b) for a, b in zip(lo, hi))
        cube_i = intensity[sl].astype(np.float64)
        cube_f = f[sl]
        stats[i] = [cube_i.mean(), cube_i.var(), cube_f.mean(), cube_f.var()]
        if d == 3:
            hu[i] = np.concatenate([hu6(cube_i.max(axis=a)) for a in range(3)])
        else:
            hu[i] = hu6(cube_i)
    with np.errstate(divide="ignore", invalid="ignore"):
        hu = np.where(hu != 0, -np.sign(hu) * np.log10(np.abs(hu)), 0.0)
    return coords, coords * np.asarray(spacing), stats, np.nan_to_num(hu)


def tracking_reference(frames_feats, max_distance_um):
    """Frame-to-frame matching -> flow rows (hu_tracking.py:1162-1232)."""
    rows = []
    for t in range(1, len(frames_feats)):
        c_post, p_post, s_post, h_post = frames_feats[t]
        c_pre, p_pre, s_pre, h_pre = frames_feats[t - 1]
        if len(c_post) == 0 or len(c_pre) == 0:
            continue
        feats_post = np.concatenate([s_post, h_post], axis=1)
        feats_pre = np.concatenate([s_pre, h_pre], axis=1)
        matches = dense_match_reference(p_post, p_pre, feats_post, feats_pre,
                                        max_distance_um, n_stats=s_post.shape[1])
        for r, c in matches:
            vec = c_post[r] - c_pre[c]
            rows.append([t - 1, *c_pre[c], *vec, 0.0])
    return np.asarray(rows) if rows else np.zeros((0, 8))


def reassign_reference(labels_seq, flow, spacing, max_distance_um=1.0):
    """Label propagation along the flow (voxel_reassignment.py:994-1058):
    per frame pair, match fg voxels by flow-predicted nearest neighbour
    (cKDTree) and vote per target (weight 1/d)."""
    from scipy.spatial import cKDTree

    num_t = labels_seq.shape[0]
    out = labels_seq.copy()
    sp = np.asarray(spacing, float)
    d = len(sp)
    for t in range(num_t - 1):
        va = np.argwhere(out[t] > 0)
        vb = np.argwhere(labels_seq[t + 1] > 0)
        if len(va) == 0 or len(vb) == 0:
            continue
        rows = flow[flow[:, 0] == t]
        vec = flow_interp_reference(va.astype(float), rows[:, 1:1 + d],
                                    rows[:, 1 + d:1 + 2 * d], rows[:, -1],
                                    sp, max(0.5 * 1.0, 0.5))
        ok = ~np.isnan(vec).any(axis=1)
        pred = (va[ok] + vec[ok]) * sp
        tree = cKDTree(vb * sp)
        dist, nn = tree.query(pred)
        keep = dist < max_distance_um
        src_lbl = out[t][tuple(va[ok][keep].T)]
        tgt = nn[keep]
        w = 1.0 / (dist[keep] + 1e-6)
        # vote: best (sum of weights) source label per target voxel
        votes = {}
        for ti, li, wi in zip(tgt, src_lbl, w):
            key = (ti, li)
            votes[key] = votes.get(key, 0.0) + wi
        best = {}
        for (ti, li), wi in votes.items():
            if ti not in best or wi > best[ti][1]:
                best[ti] = (li, wi)
        new = np.zeros(len(vb), out.dtype)
        for ti, (li, _) in best.items():
            new[ti] = li
        frame = np.zeros_like(out[t + 1])
        frame[tuple(vb.T)] = new
        out[t + 1] = frame
    return out


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------

def run_cpu_reference(data, dim_res, min_radius_um=0.25, max_radius_um=1.0):
    """The full reference pipeline in numpy/scipy on a (T, Z, Y, X)
    uint16 stack.  Returns (artifacts dict, per-stage seconds dict)."""
    from .features import (
        branch_stats,
        motility_features,
        nanstats,
        node_features,
        region_morphology,
    )

    spacing = (dim_res["Z"], dim_res["Y"], dim_res["X"])
    x_res = dim_res["X"]
    min_r_px, max_r_px = min_radius_um / x_res, max_radius_um / x_res
    s1, s2 = min_r_px / 2.0, max_r_px / 3.0
    lo, hi = min(s1, s2), max(s1, s2)
    if hi <= lo:
        hi = lo + 0.2
    step = max(0.2, (hi - lo) / 5.0)
    sigmas = sorted(np.arange(lo, hi, step).tolist())
    z_ratio = spacing[0] / x_res
    min_area = max(1, int(np.ceil((4.0 / 3.0) * np.pi * min_radius_um ** 3
                                  / float(np.prod(spacing)))))

    num_t = data.shape[0]
    times = {k: 0.0 for k in ("filter", "label", "network", "markers",
                              "tracking", "reassign", "hierarchy")}
    arts = {"frangi": [], "labels": [], "skel": [], "pixel_class": [],
            "branch_labels": [], "marker": [], "distance": [], "border": []}
    feats = []
    for t in range(num_t):
        frame = data[t].astype(np.float64)
        t0 = time.perf_counter()
        vessel = frangi_reference(frame, sigmas, spacing, z_ratio=z_ratio)
        times["filter"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        labels = label_reference(vessel, min_area)
        times["label"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        skel, pclass, branch = network_reference(labels, vessel, spacing)
        times["network"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        marker, distance, border = markers_reference(data[t], labels, spacing)
        times["markers"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        feats.append(_roi_hu_features(data[t], vessel, distance, marker, spacing))
        times["tracking"] += time.perf_counter() - t0
        for k, v in (("frangi", vessel), ("labels", labels), ("skel", skel),
                     ("pixel_class", pclass), ("branch_labels", branch),
                     ("marker", marker), ("distance", distance), ("border", border)):
            arts[k].append(v)

    t0 = time.perf_counter()
    dt = dim_res.get("T") or 1.0
    flow = tracking_reference(feats, max_distance_um=max(1.0 * dt, 0.5))
    times["tracking"] += time.perf_counter() - t0

    labels_seq = np.stack(arts["labels"])
    t0 = time.perf_counter()
    arts["reassigned"] = reassign_reference(labels_seq, flow, spacing)
    times["reassign"] += time.perf_counter() - t0

    t0 = time.perf_counter()
    tables = []
    for t in range(num_t):
        labels = arts["labels"][t]
        coords = np.argwhere(labels > 0)
        at = tuple(coords.T)
        d = 3
        max_dist = max(0.5 * dt, 0.5)
        vec01 = vec12 = None
        if t > 0:
            rows = flow[flow[:, 0] == t - 1]
            vec01 = flow_interp_reference(coords.astype(float),
                                          rows[:, 1:1 + d] + rows[:, 1 + d:1 + 2 * d],
                                          rows[:, 1 + d:1 + 2 * d], rows[:, -1],
                                          np.asarray(spacing), max_dist)
        if t < num_t - 1:
            rows = flow[flow[:, 0] == t]
            vec12 = flow_interp_reference(coords.astype(float), rows[:, 1:1 + d],
                                          rows[:, 1 + d:1 + 2 * d], rows[:, -1],
                                          np.asarray(spacing), max_dist)
        mot = motility_features(coords, vec01, vec12,
                                arts["branch_labels"][t][at].astype(np.int64),
                                spacing, dt, no_z=False)
        stats = np.stack([mot[k] for k in
                          ("linear_vel", "angular_vel", "linear_acc", "angular_acc",
                           "rel_linear_vel", "rel_angular_vel", "rel_linear_acc",
                           "rel_angular_acc", "rel_directionality")]
                         + [arts["frangi"][t][at], data[t][at].astype(np.float64)])
        nodes = np.argwhere(arts["pixel_class"][t] > 0)
        radius = arts["distance"][t][tuple(nodes.T)].astype(np.float64)
        sp = np.asarray(spacing)
        nf = node_features(nodes, radius, coords,
                           None if vec01 is None else vec01 * sp,
                           None if vec12 is None else vec12 * sp,
                           arts["border"][t] > 0, spacing, labels.shape)
        bs = branch_stats(arts["skel"][t], arts["border"][t] > 0, spacing,
                          arts["branch_labels"][t])
        morph_b = region_morphology(arts["branch_labels"][t], spacing)
        morph_o = region_morphology(labels, spacing)
        comp = labels[at].astype(np.int64)
        row_labels = np.unique(comp)
        agg_o = nanstats(stats, np.searchsorted(row_labels, comp), len(row_labels))
        tables.append({"motility": mot, "nodes": nf, "branches": bs,
                       "morph_b": morph_b, "morph_o": morph_o, "agg_o": agg_o})
    times["hierarchy"] += time.perf_counter() - t0
    arts["feature_tables"] = tables
    arts["flow"] = flow
    times["total"] = sum(v for k, v in times.items() if k != "total")
    return arts, times
