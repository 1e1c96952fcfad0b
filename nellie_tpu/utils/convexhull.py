"""Convex hulls in pure numpy (2D monotone chain, 3D quickhull).

Used by :mod:`nellie_tpu.utils.regionprops` for solidity — the discrete
convex-image voxel count — replacing the scipy.spatial Delaunay
point-in-hull test so the framework carries no scipy.spatial dependency
(the reference gets this from skimage regionprops,
``/root/reference/nellie/feature_extraction/hierarchical.py:1771-1804``).

The hulls are returned as half-space systems (A, b) with outward
normals: a point p is inside iff ``A @ p <= b + eps`` for every row.
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
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= _EPS:
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


def hull_halfspaces_3d(points: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Quickhull -> (A, b) half-space system; None for degenerate input
    (all points coplanar/collinear)."""
    pts = np.unique(np.asarray(points, np.float64), axis=0)
    n = len(pts)
    if n < 4:
        return None

    # initial simplex: extreme pair, then furthest from line, then plane
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

    # faces as vertex index triples with outward orientation
    def orient(i, j, k, opposite):
        nrm = np.cross(pts[j] - pts[i], pts[k] - pts[i])
        if nrm @ (pts[opposite] - pts[i]) > 0:
            return (i, k, j)
        return (i, j, k)

    faces = [
        orient(d0, d1, d2, d3),
        orient(d0, d1, d3, d2),
        orient(d0, d2, d3, d1),
        orient(d1, d2, d3, d0),
    ]

    def face_normal(f):
        i, j, k = f
        nrm = np.cross(pts[j] - pts[i], pts[k] - pts[i])
        ln = np.linalg.norm(nrm)
        return nrm / max(ln, _EPS)

    # assign outside sets
    def outside_set(f, candidates):
        nrm = face_normal(f)
        off = nrm @ pts[f[0]]
        dd = pts[candidates] @ nrm - off
        sel = dd > 1e-7
        return candidates[sel], dd[sel]

    all_idx = np.arange(n)
    face_list = []
    for f in faces:
        cand, dd = outside_set(f, all_idx)
        face_list.append([f, cand, dd])

    max_iter = 4 * n + 16
    it = 0
    while it < max_iter:
        it += 1
        target = None
        for entry in face_list:
            if len(entry[1]):
                target = entry
                break
        if target is None:
            break
        f, cand, dd = target
        far = int(cand[int(np.argmax(dd))])
        # find visible faces
        visible = []
        for entry in face_list:
            nrm = face_normal(entry[0])
            if nrm @ pts[far] - nrm @ pts[entry[0][0]] > 1e-9:
                visible.append(entry)
        if not visible:
            # numerical stall: drop the point from every outside set
            for entry in face_list:
                keep = entry[1] != far
                entry[1], entry[2] = entry[1][keep], entry[2][keep]
            continue
        # horizon edges: edges of visible faces shared with non-visible
        visible_set = {tuple(e[0]) for e in visible}
        edge_count = {}
        for e in visible:
            i, j, k = e[0]
            for u, v in ((i, j), (j, k), (k, i)):
                key = (min(u, v), max(u, v))
                edge_count[key] = edge_count.get(key, 0) + 1
                edge_count[(key, "dir")] = (u, v)
        horizon = [edge_count[(key, "dir")]
                   for key, cnt in edge_count.items()
                   if not isinstance(key[1], str) and isinstance(cnt, int) and cnt == 1]
        # candidate points to redistribute
        orphan = np.unique(np.concatenate([e[1] for e in visible]))
        face_list = [e for e in face_list if tuple(e[0]) not in visible_set]
        for (u, v) in horizon:
            nf = (u, v, far)
            nrm = np.cross(pts[v] - pts[u], pts[far] - pts[u])
            if np.linalg.norm(nrm) < _EPS:
                continue
            # orient outward: interior point = centroid of initial simplex
            interior = (a + b + c + d) / 4.0
            if nrm @ (interior - pts[u]) > 0:
                nf = (u, far, v)
            cand2, dd2 = outside_set(nf, orphan)
            face_list.append([nf, cand2, dd2])

    normals = np.stack([face_normal(e[0]) for e in face_list])
    offsets = np.asarray([face_normal(e[0]) @ pts[e[0][0]] for e in face_list])
    return normals, offsets


def convex_image_count(coords: np.ndarray) -> Optional[int]:
    """Number of integer grid points (over the coords' bbox) inside the
    convex hull — skimage's discrete ``convex_image`` voxel count."""
    coords = np.asarray(coords)
    ndim = coords.shape[1]
    hs = hull_halfspaces_2d(coords) if ndim == 2 else hull_halfspaces_3d(coords)
    if hs is None:
        return None
    A, b = hs
    mins = coords.min(axis=0)
    maxs = coords.max(axis=0)
    grids = np.meshgrid(*[np.arange(lo, hi + 1) for lo, hi in zip(mins, maxs)],
                        indexing="ij")
    pts = np.stack([g.ravel() for g in grids], axis=1).astype(np.float64)
    inside = np.all(pts @ A.T <= b[None, :] + 1e-7, axis=1)
    return int(inside.sum())
