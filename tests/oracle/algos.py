"""Reference-algorithm oracles: the reference pipeline's numpy/scipy
semantics re-implemented independently of ``nellie_tpu``.

These mirror the algorithms of ``/root/reference/nellie`` (filtering.py,
labelling.py, networking.py, mocap_marking.py, hu_tracking.py,
flow_interpolation.py, hierarchical.py) in their native numpy/scipy form
— NOT the TPU kernels — so every pipeline stage has a genuine
cross-implementation check, not just a self-recorded golden.

Tolerance policy (per artifact, used by test_stage_parity.py):

| artifact            | check                                   | why |
|---------------------|------------------------------------------|-----|
| im_preprocessed     | fg-IoU > 0.95, corr > 0.98              | f32 vs f64 reassociation + histogram-bin quantisation |
| im_instance_label   | component count ==, fg IoU > 0.98       | threshold bin edges may shift single voxels |
| im_skel             | homotopy (per-object CC count) + complete-thinning property | thinning order is implementation-defined; topology is not |
| im_pixel_class      | exact given identical skeleton          | pure 3^3 convolution |
| im_distance         | atol 1e-3 within clamp                  | JFA is exact modulo fp; clamp saturates |
| im_border           | exact                                   | boolean morphology |
| flow rows           | identical match set                      | mutual argmin on z-scored costs is discrete |
| features CSVs       | rtol 1e-4, NaN-equal                    | f32 segment reductions vs f64 loops |
"""
from __future__ import annotations

import numpy as np
import scipy.ndimage as ndi


def np_threshold_otsu(vals, nbins=256):
    counts, edges = np.histogram(vals, bins=nbins, range=(vals.min(), vals.max()))
    centers = (edges[:-1] + edges[1:]) / 2
    p = counts / max(counts.sum(), 1)
    w1 = np.cumsum(p)
    m1 = np.divide(np.cumsum(p * centers), w1, out=np.zeros_like(w1), where=w1 > 0)
    w2 = np.cumsum(p[::-1])[::-1]
    m2 = (np.divide(np.cumsum((p * centers)[::-1]), np.cumsum(p[::-1]),
                    out=np.zeros(nbins), where=np.cumsum(p[::-1]) > 0))[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return centers[np.argmax(var12)]


def np_threshold_triangle(vals, nbins=256):
    """Reference triangle threshold (gpu_functions.py:53-92): search the
    low-level -> peak side, flipping when the peak sits nearer the low end."""
    hist, edges = np.histogram(vals, bins=nbins, range=(vals.min(), vals.max()))
    centers = (edges[:-1] + edges[1:]) / 2
    hist = hist / max(hist.sum(), 1)
    arg_peak = int(np.argmax(hist))
    peak_h = hist[arg_peak]
    nz = np.flatnonzero(hist)
    arg_low, arg_high = int(nz[0]), int(nz[-1])
    flip = arg_peak - arg_low < arg_high - arg_peak
    if flip:
        hist = hist[::-1]
        arg_low = nbins - arg_high - 1
        arg_peak = nbins - arg_peak - 1
    width = arg_peak - arg_low
    if width <= 0:
        arg_level = arg_peak
    else:
        x1 = np.arange(width)
        y1 = hist[x1 + arg_low]
        norm = np.sqrt(peak_h ** 2 + width ** 2)
        length = (peak_h / norm) * x1 - (width / norm) * y1
        arg_level = int(np.argmax(length)) + arg_low
    if flip:
        arg_level = nbins - arg_level - 1
    return centers[arg_level]


def frangi_reference(frame, sigmas, spacing, z_ratio=1.0,
                     alpha_sq=0.5, beta_sq=0.5, truncate=3.0):
    """Multi-scale Frangi vesselness, reference semantics
    (filtering.py:806-853): incremental Gaussian cascade, per-scale gamma,
    gradient-of-gradient Hessian, masked LAPACK eigensolve, 3D response."""
    def sigma_vec(s):
        if frame.ndim == 2:
            return (s, s)
        return (s / z_ratio, s, s)

    gauss = frame.astype(np.float64)
    vessel = np.zeros_like(gauss)
    all_mask = np.ones(frame.shape, bool)
    prev = 0.0
    for sigma in sigmas:
        vp, vc = sigma_vec(prev), sigma_vec(sigma)
        delta = tuple(np.sqrt(max(0.0, c * c - p * p)) for p, c in zip(vp, vc))
        if any(d > 0 for d in delta):
            gauss = ndi.gaussian_filter(gauss, delta, mode="reflect", truncate=truncate)
        prev = sigma
        pos = gauss[gauss > 0]
        gamma = min(np_threshold_triangle(pos), np_threshold_otsu(pos)) if pos.size else 1.0
        gamma_sq = 2 * gamma * gamma

        grads = np.gradient(gauss, *spacing)
        ndim = frame.ndim
        H = {}
        for i in range(ndim):
            for j in range(i, ndim):
                H[(i, j)] = np.gradient(grads[i], spacing[j], axis=j)
        comps = list(H.values())
        frob = np.sqrt(sum(h * h for h in comps)
                       + sum(H[(i, j)] ** 2 for i in range(ndim)
                             for j in range(i + 1, ndim)))
        max_abs = max(np.abs(c).max() for c in comps) or 1.0
        frob = frob / max_abs
        fpos = frob[frob > 0]
        h_mask = frob > (min(np_threshold_triangle(fpos), np_threshold_otsu(fpos)) / 2
                         if fpos.size else 0)
        idx = np.where(h_mask)
        n = idx[0].size
        Hm = np.zeros((n, ndim, ndim))
        for i in range(ndim):
            for j in range(ndim):
                Hm[:, i, j] = H[(min(i, j), max(i, j))][idx]
        ev = np.linalg.eigvalsh(Hm)
        order = np.argsort(np.abs(ev), axis=1)
        ev = np.take_along_axis(ev, order, axis=1)
        if ndim == 2:
            l1, l2 = ev[:, 0], ev[:, 1]
            rb = (np.abs(l1) / (np.abs(l2) + 1e-12)) ** 2
            s2 = l1 ** 2 + l2 ** 2
            v = np.exp(-rb / beta_sq) * (1 - np.exp(-s2 / gamma_sq))
            v[l2 > 0] = 0
        else:
            l1, l2, l3 = ev[:, 0], ev[:, 1], ev[:, 2]
            ra = (np.abs(l2) / (np.abs(l3) + 1e-12)) ** 2
            rb = (np.abs(l2) / (np.sqrt(np.abs(l2 * l3)) + 1e-12)) ** 2
            s2 = l1 ** 2 + l2 ** 2 + l3 ** 2
            v = ((1 - np.exp(-ra / alpha_sq)) * np.exp(-rb / beta_sq)
                 * (1 - np.exp(-s2 / gamma_sq)))
            v[(l3 > 0) | (l2 > 0)] = 0
        out = np.zeros_like(gauss)
        out[idx] = np.nan_to_num(v)
        vessel = np.maximum(vessel, out)
        all_mask &= h_mask
    return vessel * all_mask


def label_reference(vessel, min_area, fill=True):
    """Threshold (log10 min(tri, otsu)) -> fill -> CC -> area filter ->
    smooth -> relabel (labelling.py:440-509)."""
    pos = vessel[vessel > 0]
    if pos.size == 0:
        return np.zeros(vessel.shape, np.int32)
    logv = np.log10(pos)
    thr = min(10 ** np_threshold_triangle(logv), 10 ** np_threshold_otsu(logv))
    mask = vessel > thr
    if fill and vessel.ndim == 3:
        mask = ndi.binary_fill_holes(mask)
    structure = np.ones((3,) * vessel.ndim)
    labels, _ = ndi.label(mask, structure=structure)
    areas = np.bincount(labels.ravel())
    areas[0] = 0
    mask = (areas >= min_area)[labels]
    mask = ndi.uniform_filter(mask.astype(np.float64), 3) > 0.5
    labels, _ = ndi.label(mask, structure=structure)
    return labels.astype(np.int32)


def pixel_class_reference(skel_labels):
    """3^3 occupancy count of the skeleton mask, clipped at 4
    (networking.py:669-680)."""
    m = (skel_labels > 0).astype(np.uint8)
    s = ndi.convolve(m.astype(np.int32), np.ones((3,) * m.ndim, np.int32),
                     mode="constant") * m
    return np.minimum(s, 4).astype(np.uint8)


def distance_reference(mask, clamp=None):
    d = ndi.distance_transform_edt(mask)
    if clamp is not None:
        d = np.minimum(d, clamp)
    return d.astype(np.float32)


def border_reference(mask):
    """dilate(mask) XOR mask (mocap_marking.py:440)."""
    dil = ndi.binary_dilation(mask, structure=ndi.generate_binary_structure(mask.ndim, 1))
    return (dil ^ mask).astype(np.uint8)


def is_simple_point_reference(patch):
    """Independent Bertrand–Malandain (26,6) simple-point test on a 3x3x3
    boolean patch with fg center, via scipy component labelling (distinct
    implementation from the product's LUT/arithmetic/bitmask backends)."""
    assert patch.shape == (3, 3, 3) and patch[1, 1, 1]
    nb = patch.copy()
    nb[1, 1, 1] = False
    n_fg = int(nb.sum())
    if n_fg <= 1:
        return False  # isolated or endpoint: never deleted by curve thinning
    _, n26 = ndi.label(nb, structure=np.ones((3, 3, 3)))
    if n26 != 1:
        return False
    # bg 6-components within N18 touching a face
    off = np.abs(np.mgrid[-1:2, -1:2, -1:2]).sum(axis=0)
    n18 = off <= 2
    bg = (~patch) & n18
    lbl, _ = ndi.label(bg, structure=ndi.generate_binary_structure(3, 1))
    faces = [(0, 1, 1), (2, 1, 1), (1, 0, 1), (1, 2, 1), (1, 1, 0), (1, 1, 2)]
    roots = {lbl[f] for f in faces if bg[f]}
    roots.discard(0)
    return len(roots) == 1


def count_remaining_simple_points(skel):
    """Number of deletable (simple, non-endpoint) voxels left — a complete
    thinning has zero."""
    pad = np.pad(skel.astype(bool), 1)
    count = 0
    for z, y, x in np.argwhere(pad):
        patch = pad[z - 1:z + 2, y - 1:y + 2, x - 1:x + 2]
        if is_simple_point_reference(patch):
            count += 1
    return count


def dense_match_reference(coords_post, coords_pre, feats_post, feats_pre,
                          max_distance, n_stats, cutoff=1.0):
    """Reference dense matching (hu_tracking.py:751-944): distance mask,
    |Δfeature| z-scored over masked pairs, cost = dist_z + stats_z/n +
    hu_z/m, union of row & column argmins under the cutoff."""
    diff = coords_post[:, None, :] - coords_pre[None, :, :]
    dist = np.sqrt((diff ** 2).sum(2))
    mask = dist < max_distance
    if not mask.any():
        return []
    feats = [dist / max_distance]
    for f in range(feats_post.shape[1]):
        feats.append(np.abs(feats_post[:, f][:, None] - feats_pre[:, f][None, :]))
    cost = np.zeros_like(dist)
    n_hu = feats_post.shape[1] - n_stats
    for k, d in enumerate(feats):
        vals = d[mask]
        mean, std = vals.mean(), vals.std() + 1e-8
        z = (d - mean) / std
        denom = 1 if k == 0 else (n_stats if k - 1 < n_stats else n_hu)
        cost += z / denom
    cost[~mask] = np.inf
    matches = set()
    rows = np.argmin(cost, axis=1)
    for r, c in enumerate(rows):
        if cost[r, c] < cutoff:
            matches.add((r, int(c)))
    cols = np.argmin(cost, axis=0)
    for c, r in enumerate(cols):
        if cost[r, c] < cutoff:
            matches.add((int(r), c))
    return sorted(matches)


def flow_interp_reference(coords, flow_coords, flow_vecs, flow_costs,
                          scaling, max_distance):
    """Reference flow interpolation weighting (flow_interpolation.py:141-256)."""
    out = np.full((len(coords), flow_vecs.shape[1]), np.nan)
    fc = flow_coords * scaling
    for i, c in enumerate(coords):
        d = np.linalg.norm(c * scaling - fc, axis=1)
        sel = d <= max_distance
        if not sel.any():
            continue
        dist = d[sel]
        if (dist == 0).any():
            dw = (dist == 0).astype(float)
        else:
            dw = 1.0 / dist
        w = (-flow_costs[sel]) * dw
        w = w - w.min() + 1
        w = w / w.sum()
        out[i] = (w[:, None] * flow_vecs[sel]).sum(0)
    return out


def branch_length_reference(skel_labels, spacing):
    """Half-neighbourhood edge sweep (hierarchical.py:1515-1618)."""
    import itertools

    L = np.asarray(skel_labels)
    ndim = L.ndim
    lengths = np.zeros(int(L.max()) + 1)
    for off in itertools.product((-1, 0, 1), repeat=ndim):
        if off <= (0,) * ndim:
            continue
        src = tuple(slice(max(0, o), L.shape[d] + min(0, o)) for d, o in enumerate(off))
        dst = tuple(slice(max(0, -o), L.shape[d] - max(0, o)) for d, o in enumerate(off))
        base, neigh = L[src], L[dst]
        same = (base > 0) & (base == neigh)
        elen = np.sqrt(sum((o * s) ** 2 for o, s in zip(off, spacing)))
        np.add.at(lengths, base[same].ravel(), elen)
    return lengths
