"""Flow vector interpolation (forward/backward) at arbitrary coordinates.

TPU-native rebuild of the reference ``FlowInterpolator``
(``/root/reference/nellie/tracking/flow_interpolation.py``): instead of a
per-timepoint cKDTree radius query, each tile of query coordinates is
scored against *all* flow vectors of the frame with a masked distance
matrix (flow-vector counts are small — they live at mocap markers), and
the reference's weighting is reproduced exactly:

  w = (−cost) · (1/dist)          (indicator(dist==0) if any zero dist)
  w := w − min(w) + 1; w /= Σw    (shift-normalise over the radius set)
  v = Σ w · vec                   (NaN where the radius set is empty)

Public surface matches the reference: ``FlowInterpolator(im_info,
forward=...)`` with ``interpolate_coord(coords, t)``, plus the
module-level ``interpolate_all_forward`` / ``interpolate_all_backward``
track builders used by the GUI and feature extraction.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from nellie_tpu.io.verifier import ImInfo


def _interp_tile_body(query_scaled, query_valid, flow_scaled, flow_valid,
                      vectors, costs, max_distance):
    """Weighted flow at each query coordinate.

    query_scaled: (Q, d) physical coords; flow_scaled: (M, d); vectors
    (M, d) voxel-space; costs (M,).  Returns (Q, d) vectors with NaN rows
    where no flow vector lies within max_distance.
    """
    diff = query_scaled[:, None, :] - flow_scaled[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=2))  # (Q, M)
    mask = (dist <= max_distance) & query_valid[:, None] & flow_valid[None, :]

    cost_w = -costs[None, :]
    has_zero = jnp.any(mask & (dist == 0), axis=1, keepdims=True)
    inv = jnp.where(dist > 0, 1.0 / jnp.where(dist > 0, dist, 1.0), 0.0)
    dist_w = jnp.where(has_zero, (dist == 0).astype(jnp.float32), inv)
    w = cost_w * dist_w

    big = jnp.float32(jnp.inf)
    w_min = jnp.min(jnp.where(mask, w, big), axis=1, keepdims=True)
    w = w - w_min + 1.0
    w = jnp.where(mask, w, 0.0)
    w_sum = jnp.sum(w, axis=1, keepdims=True)
    any_nb = jnp.any(mask, axis=1, keepdims=True)
    w = w / jnp.where(w_sum > 0, w_sum, 1.0)

    out = jnp.einsum("qm,md->qd", w, vectors, preferred_element_type=jnp.float32)
    return jnp.where(any_nb, out, jnp.nan)


_INTERP_TILE = 8192


@jax.jit
def _interp_all_kernel(query_scaled, query_valid, flow_scaled, flow_valid,
                       vectors, costs, max_distance):
    """All query tiles in ONE program (lax.map bounds the (Q, M) distance
    matrix to one tile of VMEM-friendly size) — one dispatch and one
    device->host pull per call instead of one per tile, which dominated
    on the ~20 ms/round-trip tunnelled link."""
    q = query_scaled.reshape(-1, _INTERP_TILE, query_scaled.shape[1])
    qv = query_valid.reshape(-1, _INTERP_TILE)

    def one(args):
        qq, vv = args
        return _interp_tile_body(qq, vv, flow_scaled, flow_valid,
                                 vectors, costs, max_distance)

    return jax.lax.map(one, (q, qv)).reshape(query_scaled.shape)


def _bucket(n, minimum=64):
    b = minimum
    while b < n:
        b *= 2
    return b


class FlowInterpolator:
    """Inverse-distance + cost weighted flow interpolation, fwd or bwd."""

    def __init__(self, im_info: ImInfo, num_t=None, max_distance_um=0.5, forward=True):
        self.im_info = im_info
        if self.im_info.no_t:
            return

        self.num_t = num_t
        if num_t is None and not self.im_info.no_t:
            self.num_t = im_info.shape[im_info.axes.index("T")]

        if self.im_info.no_z:
            self.scaling = (im_info.dim_res["Y"], im_info.dim_res["X"])
        else:
            self.scaling = (im_info.dim_res["Z"], im_info.dim_res["Y"], im_info.dim_res["X"])

        self.max_distance_um = max(max_distance_um * (im_info.dim_res["T"] or 1.0), 0.5)
        self.forward = forward
        self.shape = ()
        self.im_memmap = None
        self.flow_vector_array = None
        self.current_t = None
        self.check_rows = None
        self.check_coords = None
        self._initialize()

    def _allocate_memory(self):
        self.im_memmap = self.im_info.get_memmap(self.im_info.im_path)
        self.shape = self.im_memmap.shape
        self.flow_vector_array = np.load(self.im_info.pipeline_paths["flow_vector_array"])

    def _get_t(self):
        if self.num_t is None:
            self.num_t = 1 if self.im_info.no_t else self.im_info.shape[self.im_info.axes.index("T")]

    def _initialize(self):
        if self.im_info.no_t:
            return
        self._get_t()
        self._allocate_memory()

    def _select_rows(self, t):
        """Cache flow rows/origins for timepoint t (fwd: origins; bwd:
        origins + vectors, reference ``flow_interpolation.py:277-292``)."""
        d = 2 if self.im_info.no_z else 3
        if self.forward:
            rows = self.flow_vector_array[self.flow_vector_array[:, 0] == t]
            coords = rows[:, 1 : 1 + d]
        else:
            rows = self.flow_vector_array[self.flow_vector_array[:, 0] == t - 1]
            coords = rows[:, 1 : 1 + d] + rows[:, 1 + d : 1 + 2 * d]
        self.check_rows = rows
        self.check_coords = coords
        self.current_t = t

    def interpolate_coord_dev(self, coords, t):
        """Device-resident variant of :meth:`interpolate_coord`: dispatch
        the interpolation kernel and return the PADDED device result
        (``(npad, d)`` float32, voxel units, NaN rows where no flow
        vector is within the radius) without pulling it to host — callers
        that feed the vectors straight into further device kernels (the
        hierarchy's motility bundle, the fused reassignment pair program)
        save a round trip each way over the link.

        Returns ``(result_dev, n)`` — rows ``[:n]`` are the queries in
        input order — or ``None`` when there are no flow vectors for
        this timepoint (the host variant's all-NaN case).
        """
        if self.current_t != t:
            self._select_rows(t)
        coords = np.asarray(coords, float)
        if coords.size == 0 or self.check_coords.shape[0] == 0:
            return None
        d = coords.shape[1]
        m = self.check_coords.shape[0]

        scaling = np.asarray(self.scaling, float)
        flow_scaled = (self.check_coords * scaling).astype(np.float32)
        vectors = self.check_rows[:, 1 + d : 1 + 2 * d].astype(np.float32)
        costs = self.check_rows[:, -1].astype(np.float32)

        mb = _bucket(m)
        flow_p = np.zeros((mb, d), np.float32)
        flow_p[:m] = flow_scaled
        vec_p = np.zeros((mb, d), np.float32)
        vec_p[:m] = vectors
        cost_p = np.zeros((mb,), np.float32)
        cost_p[:m] = costs
        fvalid = np.zeros((mb,), bool)
        fvalid[:m] = True

        finite = ~np.isnan(coords).any(axis=1)
        query_scaled = np.where(finite[:, None], coords * scaling, 0.0).astype(np.float32)

        # pad the query count to a power-of-two multiple of the tile so
        # the one-program path compiles a handful of shapes per dataset
        n = coords.shape[0]
        npad = _bucket(n, _INTERP_TILE)
        q = np.zeros((npad, d), np.float32)
        q[:n] = query_scaled
        qv = np.zeros((npad,), bool)
        qv[:n] = finite
        res = _interp_all_kernel(
            jnp.asarray(q), jnp.asarray(qv), jnp.asarray(flow_p), jnp.asarray(fvalid),
            jnp.asarray(vec_p), jnp.asarray(cost_p), jnp.float32(self.max_distance_um),
        )
        return res, n

    def interpolate_coord(self, coords, t, tile: int = _INTERP_TILE):
        del tile  # kept for API compat; the one-program kernel owns tiling
        """Interpolated flow vectors (voxel units) at ``coords``; NaN rows
        where no flow vector is within the radius."""
        coords = np.asarray(coords, float)
        if coords.size == 0:
            return np.zeros((0, coords.shape[1] if coords.ndim == 2 else 0))
        out = self.interpolate_coord_dev(coords, t)
        if out is None:
            return np.full(coords.shape, np.nan)
        res, n = out
        return np.asarray(res)[:n].astype(np.float32)


def interpolate_all_forward(coords, start_t, end_t, im_info, min_track_num=0, max_distance_um=0.5):
    """Walk coords forward through time building napari-format tracks
    (reference ``flow_interpolation.py:317-370``)."""
    flow_interpx = FlowInterpolator(im_info, forward=True, max_distance_um=max_distance_um)
    coords = np.asarray(coords, float).copy()
    tracks = []
    track_properties = {"frame_num": []}
    frame_range = np.arange(start_t, end_t)
    for t in frame_range:
        final_vector = flow_interpx.interpolate_coord(coords, t)
        if final_vector is None or len(final_vector) == 0:
            continue
        for coord_num, coord in enumerate(coords):
            if np.all(np.isnan(final_vector[coord_num])):
                coords[coord_num] = np.nan
                continue
            if t == frame_range[0]:
                tracks.append([coord_num + min_track_num, frame_range[0], *coord])
                track_properties["frame_num"].append(int(frame_range[0]))
            track_properties["frame_num"].append(int(t) + 1)
            coords[coord_num] = coord + final_vector[coord_num]
            tracks.append([coord_num + min_track_num, int(t) + 1, *coords[coord_num]])
    return tracks, track_properties


def interpolate_all_backward(coords, start_t, end_t, im_info, min_track_num=0, max_distance_um=0.5):
    """Walk coords backward through time (reference
    ``flow_interpolation.py:373-426``)."""
    flow_interpx = FlowInterpolator(im_info, forward=False, max_distance_um=max_distance_um)
    coords = np.asarray(coords, float).copy()
    tracks = []
    track_properties = {"frame_num": []}
    frame_range = list(np.arange(end_t, start_t + 1))[::-1]
    for t in frame_range:
        final_vector = flow_interpx.interpolate_coord(coords, t)
        if final_vector is None or len(final_vector) == 0:
            continue
        for coord_num, coord in enumerate(coords):
            if np.all(np.isnan(final_vector[coord_num])):
                coords[coord_num] = np.nan
                continue
            if t == frame_range[0]:
                tracks.append([coord_num + min_track_num, frame_range[0], *coord])
                track_properties["frame_num"].append(int(frame_range[0]))
            coords[coord_num] = coord - final_vector[coord_num]
            tracks.append([coord_num + min_track_num, int(t) - 1, *coords[coord_num]])
            track_properties["frame_num"].append(int(t) - 1)
    return tracks, track_properties
