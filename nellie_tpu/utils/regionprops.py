"""Minimal region properties (scikit-image regionprops equivalent).

The reference uses ``skimage.measure.regionprops`` for per-label area,
centroid, axis lengths, extent and solidity
(``/root/reference/nellie/feature_extraction/hierarchical.py:1757-1804,
1917-1997``).  scikit-image is not available here, so this module
computes the same properties from first principles:

* area     — voxel count x physical voxel volume (spacing-aware)
* centroid — physical coordinates
* axis lengths — from the eigenvalues of the per-label coordinate
  covariance (normalised second central moments): 4·sqrt(λ) in 2D,
  sqrt(20·λ) in 3D (the ellipse/ellipsoid with matching moments)
* extent   — voxel count / bbox voxel count
* solidity — voxel count / voxel count of the discrete convex image
  (own quickhull half-space test over the bbox grid, utils/convexhull.py)

Everything except solidity is vectorised over labels via bincount;
solidity loops over regions (hulls are inherently per-region).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class Region:
    label: int
    area: float
    centroid: Tuple[float, ...]
    major_axis_length: float
    minor_axis_length: float
    extent: float
    solidity: float
    coords: np.ndarray  # (N, d) voxel coords
    bbox: Tuple[int, ...]


def _axis_lengths(cov_eigvals: np.ndarray, ndim: int) -> Tuple[float, float]:
    ev = np.sort(np.maximum(cov_eigvals, 0.0))
    if ndim == 2:
        return float(4.0 * np.sqrt(ev[-1])), float(4.0 * np.sqrt(ev[0]))
    # 3D: full axis length of the ellipsoid with the same second moments
    return float(np.sqrt(20.0 * ev[-1])), float(np.sqrt(20.0 * ev[0]))


def _solidity(coords: np.ndarray) -> float:
    """Voxel count / discrete convex-image voxel count (own quickhull —
    no scipy.spatial dependency)."""
    n = coords.shape[0]
    ndim = coords.shape[1]
    if n <= ndim + 1:
        return 1.0
    from nellie_tpu.utils.convexhull import convex_image_count

    convex_count = convex_image_count(coords)
    if not convex_count:
        return float("nan")
    return float(n / convex_count)


def regionprops(
    label_image: np.ndarray,
    spacing: Optional[Tuple[float, ...]] = None,
    compute_solidity: bool = True,
) -> List[Region]:
    """Per-label properties, ordered by ascending label (skimage order)."""
    label_image = np.asarray(label_image)
    ndim = label_image.ndim
    if spacing is None:
        spacing = (1.0,) * ndim
    spacing = np.asarray(spacing, np.float64)
    voxel_volume = float(np.prod(spacing))

    mask = label_image > 0
    if not mask.any():
        return []
    coords_all = np.argwhere(mask)
    labels_all = label_image[mask].astype(np.int64)
    max_label = int(labels_all.max())

    counts = np.bincount(labels_all, minlength=max_label + 1)
    present = np.nonzero(counts)[0]
    present = present[present > 0]

    # per-label coordinate sums / products (physical)
    phys = coords_all * spacing[None, :]
    sums = np.zeros((max_label + 1, ndim))
    for d in range(ndim):
        sums[:, d] = np.bincount(labels_all, weights=phys[:, d], minlength=max_label + 1)
    prods = np.zeros((max_label + 1, ndim, ndim))
    for i in range(ndim):
        for j in range(i, ndim):
            p = np.bincount(labels_all, weights=phys[:, i] * phys[:, j], minlength=max_label + 1)
            prods[:, i, j] = p
            prods[:, j, i] = p

    # bbox voxel counts
    bb_min = np.zeros((max_label + 1, ndim), np.int64)
    bb_max = np.zeros((max_label + 1, ndim), np.int64)
    for d in range(ndim):
        big = label_image.shape[d]
        bb_min[:, d] = np.full(max_label + 1, big)
        np.minimum.at(bb_min[:, d], labels_all, coords_all[:, d])
        np.maximum.at(bb_max[:, d], labels_all, coords_all[:, d])

    # group coords per label for solidity / .coords
    order = np.argsort(labels_all, kind="stable")
    sorted_labels = labels_all[order]
    sorted_coords = coords_all[order]
    boundaries = np.searchsorted(sorted_labels, present)
    boundaries_end = np.searchsorted(sorted_labels, present, side="right")

    regions = []
    for k, lbl in enumerate(present):
        n = counts[lbl]
        centroid = tuple(sums[lbl] / n)
        mean = sums[lbl] / n
        cov = prods[lbl] / n - np.outer(mean, mean)
        # skimage adds no continuous correction; use raw covariance
        try:
            ev = np.linalg.eigvalsh(cov)
            maj, mino = _axis_lengths(ev, ndim)
        except np.linalg.LinAlgError:
            maj, mino = float("nan"), float("nan")
        bbox_count = int(np.prod(bb_max[lbl] - bb_min[lbl] + 1))
        extent = float(n / bbox_count)
        coords_lbl = sorted_coords[boundaries[k] : boundaries_end[k]]
        solidity = _solidity(coords_lbl) if compute_solidity else float("nan")
        regions.append(Region(
            label=int(lbl),
            area=float(n * voxel_volume),
            centroid=centroid,
            major_axis_length=maj,
            minor_axis_length=mino,
            extent=extent,
            solidity=solidity,
            coords=coords_lbl,
            bbox=tuple(bb_min[lbl]) + tuple(bb_max[lbl] + 1),
        ))
    return regions
