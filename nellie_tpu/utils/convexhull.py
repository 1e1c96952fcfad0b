"""Convex hulls in pure numpy (2D monotone chain, 3D quickhull).

Used by :mod:`nellie_tpu.utils.regionprops` for solidity — the discrete
convex-image voxel count — replacing the scipy.spatial Delaunay
point-in-hull test so the framework carries no scipy.spatial dependency
(the reference gets this from skimage regionprops,
``/root/reference/nellie/feature_extraction/hierarchical.py:1771-1804``).

The hulls are returned as half-space systems (A, b) with outward
normals: a point p is inside iff ``A @ p <= b + eps`` for every row.
Voxelised regions produce many near-coplanar facets, so the plane set is
deduplicated before the grid test and the test itself runs as chunked
float32 matmuls.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

_EPS = 1e-9


def hull_halfspaces_2d(points: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Monotone-chain hull -> (A, b) half-spaces; None if degenerate."""
    pts = np.unique(np.asarray(points, np.float64), axis=0)
    if len(pts) < 3:
        return None
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(seq):
        out = []
        for p in seq:
            # scalar 2D cross (np.cross on 2-vectors is removed in new numpy)
            while len(out) >= 2:
                e0 = out[-1] - out[-2]
                e1 = p - out[-2]
                if e0[0] * e1[1] - e0[1] * e1[0] > _EPS:
                    break
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.asarray(lower[:-1] + upper[:-1])
    if len(hull) < 3:
        return None
    a = hull
    bpt = np.roll(hull, -1, axis=0)
    edge = bpt - a
    normals = np.stack([edge[:, 1], -edge[:, 0]], axis=1)  # outward for CCW
    norms = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / np.maximum(norms, _EPS)
    offsets = np.sum(normals * a, axis=1)
    return normals, offsets


def hull_halfspaces_3d(points: np.ndarray, tol: float = 1e-7,
                       ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Quickhull -> (A, b) half-space system; None for degenerate input
    (all points coplanar/collinear). Faces carry precomputed plane data;
    point-vs-face visibility is vectorised.

    ``tol``: points within ``tol`` of a facet count as inside.  1e-7 is
    exact for integer voxel coordinates; a half-voxel tolerance (0.5)
    bounds the facet explosion on huge smooth voxel surfaces at a
    sub-voxel approximation cost (used for giant regions only)."""
    pts = np.unique(np.asarray(points, np.float64), axis=0)
    n = len(pts)
    if n < 4:
        return None

    # initial simplex: extreme pair, furthest from line, furthest from plane
    d0 = int(np.argmin(pts[:, 0]))
    d1 = int(np.argmax(pts[:, 0]))
    if d0 == d1:
        d1 = int(np.argmax(np.linalg.norm(pts - pts[d0], axis=1)))
    a, b = pts[d0], pts[d1]
    ab = b - a
    if np.linalg.norm(ab) < _EPS:
        return None
    t = np.cross(ab, pts - a)
    d2 = int(np.argmax(np.linalg.norm(t, axis=1)))
    c = pts[d2]
    normal = np.cross(ab, c - a)
    if np.linalg.norm(normal) < _EPS:
        return None
    dist = (pts - a) @ normal
    d3 = int(np.argmax(np.abs(dist)))
    if abs(dist[d3]) < _EPS:
        return None  # coplanar
    d = pts[d3]
    interior = (a + b + c + d) / 4.0

    def make_face(i, j, k):
        """Face dict with outward plane; vertex order fixed so the normal
        points away from the interior point."""
        nrm = np.cross(pts[j] - pts[i], pts[k] - pts[i])
        ln = np.linalg.norm(nrm)
        if ln < _EPS:
            return None
        nrm = nrm / ln
        if nrm @ (interior - pts[i]) > 0:
            nrm = -nrm
            j, k = k, j
        return {"v": (i, j, k), "n": nrm, "off": float(nrm @ pts[i]),
                "out": np.empty(0, np.int64), "d": np.empty(0)}

    faces = [make_face(d0, d1, d2), make_face(d0, d1, d3),
             make_face(d0, d2, d3), make_face(d1, d2, d3)]
    faces = [f for f in faces if f is not None]
    if len(faces) < 4:
        return None

    all_idx = np.arange(n)
    for f in faces:
        dd = pts[all_idx] @ f["n"] - f["off"]
        sel = dd > tol
        f["out"], f["d"] = all_idx[sel], dd[sel]

    max_iter = 8 * n + 64
    for _ in range(max_iter):
        target = next((f for f in faces if len(f["out"])), None)
        if target is None:
            break
        far = int(target["out"][int(np.argmax(target["d"]))])
        p_far = pts[far]
        # visible faces (vectorised over the face list)
        normals = np.stack([f["n"] for f in faces])
        offs = np.asarray([f["off"] for f in faces])
        vis = normals @ p_far - offs > min(tol, 1e-9)
        if not vis.any():
            for f in faces:
                keep = f["out"] != far
                f["out"], f["d"] = f["out"][keep], f["d"][keep]
            continue
        visible = [f for f, v in zip(faces, vis) if v]
        hidden = [f for f, v in zip(faces, vis) if not v]
        # horizon: edges appearing in exactly one visible face
        edge_count: dict = {}
        for f in visible:
            i, j, k = f["v"]
            for u, v in ((i, j), (j, k), (k, i)):
                key = (min(u, v), max(u, v))
                cnt, _ = edge_count.get(key, (0, (u, v)))
                edge_count[key] = (cnt + 1, (u, v))
        horizon = [dirn for (cnt, dirn) in edge_count.values() if cnt == 1]
        orphan = np.unique(np.concatenate([f["out"] for f in visible]))
        orphan = orphan[orphan != far]
        faces = hidden
        for (u, v) in horizon:
            nf = make_face(u, v, far)
            if nf is None:
                continue
            if len(orphan):
                dd = pts[orphan] @ nf["n"] - nf["off"]
                sel = dd > tol
                nf["out"], nf["d"] = orphan[sel], dd[sel]
            faces.append(nf)

    A = np.stack([f["n"] for f in faces])
    b_off = np.asarray([f["off"] for f in faces])
    return A, b_off


def _dedup_planes(A: np.ndarray, b: np.ndarray, decimals: int = 7):
    """Voxel hulls produce many coincident facet planes; keep one of each."""
    key = np.round(np.column_stack([A, b]), decimals)
    _, idx = np.unique(key, axis=0, return_index=True)
    return A[idx], b[idx]


def _row_extremes(coords: np.ndarray) -> np.ndarray:
    """Exact hull-candidate reduction: any voxel strictly between its
    row's min-x and max-x is a convex combination of those extremes, so
    every hull vertex is a per-(leading dims)-row x-extreme.  Cuts the
    quickhull input from O(volume) to <= 2 x rows."""
    lead, x = coords[:, :-1], coords[:, -1]
    # 1D-encoded unique (np.unique(axis=0)'s void-view path is ~5x slower)
    dims = lead.max(axis=0) + 1
    key = np.ravel_multi_index(tuple(lead.T), tuple(dims))
    ukey, inv = np.unique(key, return_inverse=True)
    rows = np.column_stack(np.unravel_index(ukey, tuple(dims)))
    n_rows = len(rows)
    mn = np.full(n_rows, np.iinfo(np.int64).max)
    mx = np.full(n_rows, np.iinfo(np.int64).min)
    np.minimum.at(mn, inv, x)
    np.maximum.at(mx, inv, x)
    lo = np.column_stack([rows, mn])
    hi = np.column_stack([rows, mx])
    same = mn == mx
    return np.concatenate([lo, hi[~same]])


def convex_image_count(coords: np.ndarray) -> Optional[int]:
    """Number of integer grid points (over the coords' bbox) inside the
    convex hull — skimage's discrete ``convex_image`` voxel count."""
    coords = np.asarray(coords)
    ndim = coords.shape[1]
    if len(coords) > 64:
        coords = _row_extremes(coords)
    # giant smooth voxel surfaces explode the exact facet count; a
    # half-voxel facet tolerance bounds it at sub-voxel count error
    tol = 1e-7 if len(coords) <= 2048 else 0.5
    if ndim == 2:
        hs = hull_halfspaces_2d(coords)
    else:
        hs = hull_halfspaces_3d(coords, tol=tol)
    if hs is None:
        return None
    A, b = _dedup_planes(*hs)
    mins = coords.min(axis=0)
    maxs = coords.max(axis=0)
    dims = maxs - mins + 1

    # exact interval counting: the hull's slice at fixed leading coords is
    # an interval along the last axis whose integer bounds come straight
    # from the half-planes — O(rows x planes) instead of a full-grid test
    lead_dims = tuple(int(v) for v in dims[:-1])
    n_rows = int(np.prod(lead_dims)) if lead_dims else 1
    lead = np.column_stack(np.unravel_index(np.arange(n_rows), lead_dims)) \
        if lead_dims else np.zeros((1, 0))
    lead = lead.astype(np.float64) + mins[:-1][None, :]
    c = b[None, :] + max(tol, 1e-7) - lead @ np.ascontiguousarray(A[:, :-1].T)
    a_last = A[:, -1]
    pos = a_last > 1e-12
    neg = a_last < -1e-12
    zero = ~pos & ~neg
    hi = np.full(n_rows, float(maxs[-1]))
    if pos.any():
        hi = np.minimum(hi, np.floor((c[:, pos] / a_last[pos][None, :]).min(axis=1)))
    lo = np.full(n_rows, float(mins[-1]))
    if neg.any():
        lo = np.maximum(lo, np.ceil((c[:, neg] / a_last[neg][None, :]).max(axis=1)))
    ok = np.ones(n_rows, bool)
    if zero.any():
        ok &= (c[:, zero] >= 0).all(axis=1)
    counts = np.where(ok, np.maximum(0.0, hi - lo + 1), 0.0)
    return int(counts.sum())
