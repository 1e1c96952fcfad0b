"""Stage 7 — Hierarchy: voxel → node → branch → organelle → image features.

Rebuild of the reference ``Hierarchy``
(``/root/reference/nellie/feature_extraction/hierarchical.py``), same
outputs: five streaming CSV tables (``features_voxels/nodes/branches/
organelles/image``) and the pickled adjacency edge lists
(``adjacency_maps.pkl`` with keys v_b/v_n/v_o/n_b/n_o/b_o).

Feature definitions mirror the reference:

* Voxels  — coords, intensity, structure (Frangi), and motility from
  bwd/fwd interpolated flow: linear/angular velocity & acceleration plus
  *relative* variants against the branch-reference voxel of minimum
  |flow| and relative directionality (hierarchical.py:956-1152)
* Nodes   — skeleton-voxel features: thickness (2x distance to border),
  divergence/convergence/vergere dot products (hierarchical.py:1275-1441)
* Branches — centerline length via neighbour-offset edge sweep with tip
  radius correction, median thickness, aspect ratio, tortuosity, and
  region morphology (hierarchical.py:1444-1878)
* Components — organelle region morphology + lower-level aggregations
* Image   — whole-frame aggregations of every lower level

Group reductions run as vectorised numpy (bincount / lexsort-group)
instead of per-label Python loops; region morphology comes from
``nellie_tpu.utils.regionprops``.  The vectorised and low-memory
aggregation paths agree exactly (the reference's own parity invariant,
``tests/test_hierarchical_aggregation.py``).
"""
from __future__ import annotations

import os
import pickle
import time
import warnings

import numpy as np
import pandas as pd

# NaN-aware group statistics legitimately hit empty/all-NaN groups
warnings.filterwarnings("ignore", category=RuntimeWarning, message="Mean of empty slice")
warnings.filterwarnings("ignore", category=RuntimeWarning, message="All-NaN slice encountered")
warnings.filterwarnings("ignore", category=RuntimeWarning, message="Degrees of freedom <= 0 for slice")
warnings.filterwarnings("ignore", category=RuntimeWarning, message="invalid value encountered in divide")

from nellie_tpu.io.verifier import ImInfo
from nellie_tpu.stages.flow_interpolation import FlowInterpolator
from nellie_tpu.utils import adaptive_run
from nellie_tpu.utils.base_logger import logger
from nellie_tpu.utils.regionprops import regionprops


def distance_check(border_mask, check_coords, spacing):
    """Distance from each coordinate to the nearest border voxel."""
    border_coords = np.argwhere(border_mask) * spacing
    if border_coords.size == 0:
        return np.full(len(check_coords), np.nan, dtype=float)
    from scipy import spatial

    tree = spatial.cKDTree(border_coords)
    dist, _ = tree.query(np.asarray(check_coords) * spacing, k=1)
    return dist


def append_to_array(to_append):
    """Feature dict -> (list of 1D arrays, headers)."""
    new_array = []
    new_headers = []
    for feature, stats in to_append.items():
        if not isinstance(stats, dict):
            stats = {"raw": [np.array(stats)]}
        for stat, vals in stats.items():
            vals = np.array(vals)[0]
            new_array.append(vals)
            new_headers.append(f"{feature}_{stat}")
    return new_array, new_headers


def aggregate_stats_for_class(child_class, t, list_of_idxs, low_memory: bool = False):
    """nan mean/std/min/max/sum per group of indices for every scalar stat.

    Vectorised padded-index-matrix fast path and a low-memory loop that
    must agree exactly (reference hierarchical.py:1165-1272)."""
    aggregate_stats = {
        stat_name: {"mean": [], "std_dev": [], "min": [], "max": [], "sum": []}
        for stat_name in child_class.stats_to_aggregate
        if stat_name != "reassigned_label"
    }

    if low_memory:
        for stat_name in child_class.stats_to_aggregate:
            if stat_name == "reassigned_label":
                continue
            stat_array = np.array(getattr(child_class, stat_name)[t], dtype=float)
            if stat_array.ndim > 1:
                continue
            for idxs in list_of_idxs:
                entry = aggregate_stats[stat_name]
                if len(idxs) == 0:
                    for key in entry:
                        entry[key].append(np.nan)
                else:
                    vals = stat_array[np.asarray(idxs, int)]
                    entry["mean"].append(np.nanmean(vals))
                    entry["std_dev"].append(np.nanstd(vals))
                    entry["min"].append(np.nanmin(vals))
                    entry["max"].append(np.nanmax(vals))
                    entry["sum"].append(np.nansum(vals))
        for stat_name in aggregate_stats:
            for key in aggregate_stats[stat_name]:
                arr = np.asarray(aggregate_stats[stat_name][key], dtype=float)
                aggregate_stats[stat_name][key] = arr.reshape(1, -1)
        return aggregate_stats

    largest = max((len(idxs) for idxs in list_of_idxs), default=0)
    for stat_name in child_class.stats_to_aggregate:
        if stat_name == "reassigned_label":
            continue
        stat_array = np.array(getattr(child_class, stat_name)[t], dtype=float)
        if stat_array.ndim > 1:
            continue
        stat_array = np.append(stat_array, np.nan)
        idxs_array = np.full((len(list_of_idxs), max(largest, 1)), len(stat_array) - 1, int)
        for i, idxs in enumerate(list_of_idxs):
            if len(idxs) > 0:
                idxs_array[i, : len(idxs)] = np.asarray(idxs, int)
        vals = stat_array[idxs_array]
        entry = aggregate_stats[stat_name]
        entry["mean"].append(np.nanmean(vals, axis=1))
        entry["std_dev"].append(np.nanstd(vals, axis=1))
        entry["min"].append(np.nanmin(vals, axis=1))
        entry["max"].append(np.nanmax(vals, axis=1))
        # match the low-memory path: zero-length groups sum to NaN, not 0
        sums = np.nansum(vals, axis=1)
        group_sizes = np.array([len(idxs) for idxs in list_of_idxs])
        sums = np.where(group_sizes == 0, np.nan, sums)
        entry["sum"].append(sums)
    for stat_name in aggregate_stats:
        for key in aggregate_stats[stat_name]:
            aggregate_stats[stat_name][key] = np.array(aggregate_stats[stat_name][key])
    return aggregate_stats


def _group_indices_by_label(labels):
    """list of index arrays, one per unique nonzero label (ascending)."""
    labels = np.asarray(labels)
    if labels.size == 0:
        return []
    order = np.argsort(labels, kind="stable")
    sorted_labels = labels[order]
    uniq, starts = np.unique(sorted_labels, return_index=True)
    ends = np.append(starts[1:], len(sorted_labels))
    return [order[s:e] for u, s, e in zip(uniq, starts, ends) if u != 0]


class Hierarchy:
    """Orchestrates the five hierarchy levels and output files."""

    def __init__(
        self,
        im_info: ImInfo,
        skip_nodes: bool = True,
        viewer=None,
        use_gpu: bool = True,
        low_memory: bool = False,
        enable_motility: bool = True,
        enable_adjacency: bool = True,
        device=None,
        node_chunk_size=None,
        max_node_mask_elems: int = int(5e7),
    ):
        self.im_info = im_info
        self.num_t = self.im_info.shape[0]
        if self.im_info.no_z:
            self.spacing = (self.im_info.dim_res["Y"], self.im_info.dim_res["X"])
        else:
            self.spacing = (self.im_info.dim_res["Z"], self.im_info.dim_res["Y"],
                            self.im_info.dim_res["X"])

        self.skip_nodes = skip_nodes
        self.viewer = viewer
        self.low_memory = low_memory
        self.enable_motility = enable_motility
        self.enable_adjacency = enable_adjacency
        self.device = (device or "auto").lower()
        self.node_chunk_size = node_chunk_size
        self.max_node_mask_elems = int(max_node_mask_elems)

        self.im_raw = None
        self.im_struct = None
        self.im_distance = None
        self.im_skel = None
        self.im_pixel_class = None
        self.label_components = None
        self.label_branches = None
        self.im_border_mask = None
        self.im_obj_reassigned = None
        self.im_branch_reassigned = None

        self.flow_interpolator_fw = None
        self.flow_interpolator_bw = None

        self.voxels = None
        self.nodes = None
        self.branches = None
        self.components = None
        self.image = None

    def _resolve_node_chunk_size(self, num_nodes, num_voxels):
        if num_voxels <= 0:
            return 1
        base_chunk = self.node_chunk_size or 10000
        max_mask = self.max_node_mask_elems
        if self.low_memory:
            max_mask = max(1, max_mask // 4)
        if num_nodes > 0 and num_nodes * base_chunk > max_mask:
            base_chunk = max(1, max_mask // num_nodes)
        return int(max(1, min(base_chunk, num_voxels)))

    def _get_t(self):
        if self.num_t is None and not self.im_info.no_t:
            self.num_t = self.im_info.shape[self.im_info.axes.index("T")]
        return self.num_t

    def _allocate_memory(self):
        pp = self.im_info.pipeline_paths
        self.im_raw = self.im_info.get_memmap(self.im_info.im_path)
        self.im_struct = self.im_info.get_memmap(pp["im_preprocessed"])
        self.im_distance = self.im_info.get_memmap(pp["im_distance"])
        self.im_skel = self.im_info.get_memmap(pp["im_skel"])
        self.label_components = self.im_info.get_memmap(pp["im_instance_label"])
        self.label_branches = self.im_info.get_memmap(pp["im_skel_relabelled"])
        self.im_border_mask = self.im_info.get_memmap(pp["im_border"])
        self.im_pixel_class = self.im_info.get_memmap(pp["im_pixel_class"])

        if not self.im_info.no_t:
            obj_path = pp.get("im_obj_label_reassigned")
            br_path = pp.get("im_branch_label_reassigned")
            if obj_path and br_path and os.path.exists(obj_path) and os.path.exists(br_path):
                self.im_obj_reassigned = self.im_info.get_memmap(obj_path)
                self.im_branch_reassigned = self.im_info.get_memmap(br_path)

    def _get_hierarchies(self):
        self.voxels = Voxels(self)
        logger.info("Running voxel analysis")
        self.voxels.run()
        self.nodes = Nodes(self)
        logger.info("Running node analysis")
        self.nodes.run()
        self.branches = Branches(self)
        logger.info("Running branch analysis")
        self.branches.run()
        self.components = Components(self)
        logger.info("Running component analysis")
        self.components.run()
        self.image = Image(self)
        logger.info("Running image analysis")
        self.image.run()

    # -- output streaming ------------------------------------------------------
    @staticmethod
    def _iter_feature_arrays(level, labels=None):
        all_attr = []
        for name in ("aggregate_node_metrics", "aggregate_voxel_metrics",
                     "aggregate_branch_metrics", "aggregate_component_metrics"):
            attr = getattr(level, name, None)
            if attr:
                all_attr.append(attr)
        for feature in getattr(level, "features_to_save", []):
            vals = getattr(level, feature, None)
            if vals is None or len(vals) == 0:
                continue
            all_attr.append([{feature: vals[t]} for t in range(len(vals))])
        if not all_attr:
            return
        num_frames = len(all_attr[0])
        for t in range(num_frames):
            time_dict = {}
            for attr in all_attr:
                time_dict.update(attr[t])
            time_array, new_headers = append_to_array(time_dict)
            if labels is None:
                labels_t = np.arange(len(time_array[0]), dtype=np.int64)
            else:
                labels_t = np.asarray(labels[t])
            t_col = np.full(labels_t.shape[0], t, dtype=np.int64)
            time_array.insert(0, labels_t)
            time_array.insert(0, t_col)
            yield t, np.array(time_array).T, new_headers

    def _stream_csv(self, level, path, labels=None):
        first = True
        headers_full = None
        for _, frame_array, headers in self._iter_feature_arrays(level, labels=labels):
            if first:
                headers_full = ["t", "label"] + headers
            df = pd.DataFrame(frame_array, columns=headers_full)
            df.to_csv(path, index=False, mode="w" if first else "a", header=first)
            first = False

    def _save_dfs(self):
        if self.viewer is not None:
            self.viewer.status = "Saving features to csv files."
        pp = self.im_info.pipeline_paths
        self._stream_csv(self.voxels, pp["features_voxels"])
        if not self.skip_nodes:
            self._stream_csv(self.nodes, pp["features_nodes"])
        self._stream_csv(self.branches, pp["features_branches"], labels=self.branches.branch_label)
        self._stream_csv(self.components, pp["features_organelles"],
                         labels=self.components.component_label)
        self._stream_csv(self.image, pp["features_image"])

    def _save_adjacency_maps(self):
        """Sparse edge lists (reference hierarchical.py:433-609)."""
        v_n, v_b, v_o = [], [], []
        for t in range(len(self.voxels.time)):
            if not self.skip_nodes:
                edges_vn = []
                for voxel_idx, nodes in enumerate(self.voxels.node_labels[t]):
                    if nodes is None or len(nodes) == 0:
                        continue
                    for n in nodes:
                        edges_vn.append((voxel_idx, int(n)))
                v_n.append(np.array(edges_vn, np.int64) if edges_vn else np.zeros((0, 2), np.int64))

            branch_labels = np.asarray(self.voxels.branch_labels[t], np.int64)
            mask = branch_labels > 0
            if mask.any():
                v_b.append(np.column_stack((np.nonzero(mask)[0], branch_labels[mask] - 1)))
            else:
                v_b.append(np.zeros((0, 2), np.int64))

            component_labels = np.asarray(self.voxels.component_labels[t], np.int64)
            mask = component_labels > 0
            if mask.any():
                v_o.append(np.column_stack((np.nonzero(mask)[0], component_labels[mask])))
            else:
                v_o.append(np.zeros((0, 2), np.int64))

        def _label_edges(member_labels, level_labels):
            member_labels = np.asarray(member_labels, np.int64)
            level_labels = np.asarray(level_labels, np.int64)
            if len(level_labels) == 0:
                return np.zeros((0, 2), np.int64)
            max_label = int(level_labels.max())
            label_to_idx = np.full(max_label + 1, -1, np.int64)
            label_to_idx[level_labels] = np.arange(len(level_labels), dtype=np.int64)
            clipped = np.clip(member_labels, 0, max_label)
            idx = np.where(member_labels <= max_label, label_to_idx[clipped], -1)
            mask = idx >= 0
            return np.column_stack((np.nonzero(mask)[0], idx[mask]))

        n_b, n_o = [], []
        if not self.skip_nodes:
            for t in range(len(self.nodes.time)):
                n_b.append(_label_edges(self.nodes.branch_label[t], self.branches.branch_label[t]))
                n_o.append(_label_edges(self.nodes.component_label[t],
                                        self.components.component_label[t]))
        b_o = []
        for t in range(len(self.branches.time)):
            b_o.append(_label_edges(self.branches.component_label[t],
                                    self.components.component_label[t]))

        edges = {"v_b": v_b, "v_n": v_n, "v_o": v_o, "n_b": n_b, "n_o": n_o, "b_o": b_o}
        with open(self.im_info.pipeline_paths["adjacency_maps"], "wb") as f:
            pickle.dump(edges, f)

    def _run_hierarchy(self):
        self._get_t()
        if (self.enable_motility and not self.im_info.no_t
                and self.num_t is not None and self.num_t > 1):
            self.flow_interpolator_fw = FlowInterpolator(self.im_info)
            self.flow_interpolator_bw = FlowInterpolator(self.im_info, forward=False)
        else:
            self.flow_interpolator_fw = None
            self.flow_interpolator_bw = None

        self._allocate_memory()
        self._get_hierarchies()
        self._save_dfs()
        if self.viewer is not None:
            self.viewer.status = "Finalizing run."
        if self.enable_adjacency:
            self._save_adjacency_maps()
        if self.viewer is not None:
            self.viewer.status = "Done!"

    def run(self):
        def attempt(dev, low):
            self.low_memory = low
            self._run_hierarchy()

        adaptive_run.run_with_ladder("Hierarchy", self.device, self.low_memory,
                                     self.im_info, attempt)


class Voxels:
    """Voxel-level features (reference hierarchical.py:683-1163)."""

    def __init__(self, hierarchy: Hierarchy):
        self.hierarchy = hierarchy
        self.time = []
        self.coords = []
        self.x = []
        self.y = []
        self.z = []
        self.intensity = []
        self.structure = []
        self.vec01 = []
        self.vec12 = []
        self.angular_acc = []
        self.angular_vel = []
        self.angular_vel_vector = []
        self.linear_acc = []
        self.linear_vel = []
        self.linear_vel_vector = []
        self.rel_angular_acc = []
        self.rel_angular_vel = []
        self.rel_linear_acc = []
        self.rel_linear_vel = []
        self.rel_directionality = []
        self.node_labels = []
        self.branch_labels = []
        self.component_labels = []
        self.image_name = []
        self.node_dim0_lims = []
        self.node_dim1_lims = []
        self.node_dim2_lims = []
        self.node_voxel_idxs = []

        self.stats_to_aggregate = [
            "linear_vel", "angular_vel", "linear_acc", "angular_acc",
            "rel_linear_vel", "rel_angular_vel", "rel_linear_acc",
            "rel_angular_acc", "rel_directionality", "structure", "intensity",
        ]
        self.features_to_save = self.stats_to_aggregate + ["x", "y", "z"]

    # -- node-region assignment -----------------------------------------------
    def _get_node_info(self, t, frame_coords):
        """Radius-box voxel->node assignment (hierarchical.py:743-857)."""
        h = self.hierarchy
        skeleton_pixels = np.argwhere(h.im_pixel_class[t] > 0)
        skeleton_radius = np.asarray(h.im_distance[t])[tuple(skeleton_pixels.T)]

        def lims(dim, max_dim):
            lo = (skeleton_pixels[:, dim] - skeleton_radius).astype(int)
            hi = (skeleton_pixels[:, dim] + skeleton_radius).astype(int) + 1
            lo = np.clip(lo, 0, max_dim)
            hi = np.clip(hi, 0, max_dim)
            return np.stack([lo, hi], axis=1)

        axes = h.im_info.axes
        if not h.im_info.no_z:
            max0 = h.im_info.shape[axes.index("Z")]
            max1 = h.im_info.shape[axes.index("Y")]
            max2 = h.im_info.shape[axes.index("X")]
            lims0, lims1, lims2 = lims(0, max0), lims(1, max1), lims(2, max2)
        else:
            max0 = h.im_info.shape[axes.index("Y")]
            max1 = h.im_info.shape[axes.index("X")]
            lims0, lims1, lims2 = lims(0, max0), lims(1, max1), None

        self.node_dim0_lims.append(lims0)
        self.node_dim1_lims.append(lims1)
        self.node_dim2_lims.append(lims2)

        frame_coords = np.asarray(frame_coords)
        num_nodes = len(skeleton_pixels)
        num_voxels = len(frame_coords)
        chunk_size = h._resolve_node_chunk_size(num_nodes, num_voxels)

        per_voxel_nodes = []
        node_voxel_idxs = [[] for _ in range(num_nodes)]
        for start in range(0, num_voxels, chunk_size):
            end = min(start + chunk_size, num_voxels)
            cc = frame_coords[start:end]
            mask = (lims0[:, 0][:, None] <= cc[:, 0]) & (lims0[:, 1][:, None] >= cc[:, 0])
            mask &= (lims1[:, 0][:, None] <= cc[:, 1]) & (lims1[:, 1][:, None] >= cc[:, 1])
            if lims2 is not None:
                mask &= (lims2[:, 0][:, None] <= cc[:, 2]) & (lims2[:, 1][:, None] >= cc[:, 2])
            rows, cols = np.nonzero(mask)
            voxel_nodes = [[] for _ in range(end - start)]
            for r, c in zip(rows, cols):
                voxel_nodes[c].append(r)
                node_voxel_idxs[r].append(c + start)
            per_voxel_nodes.extend(np.array(v, int) for v in voxel_nodes)

        self.node_labels.append(per_voxel_nodes)
        self.node_voxel_idxs.append([np.array(v, int) for v in node_voxel_idxs])

    # -- motility ---------------------------------------------------------------
    def _get_min_euc_dist(self, t, vec):
        """Representative (min |vec|) voxel index per branch label, vectorised."""
        euc = np.linalg.norm(vec, axis=1)
        branch_labels = np.asarray(self.branch_labels[t], np.int64)
        if branch_labels.size == 0:
            return np.array([], float)
        max_label = int(branch_labels.max())
        idxmin = np.full(max_label + 1, np.nan)
        valid = ~np.isnan(euc)
        if not valid.any():
            return idxmin
        # lexsort: group by label, then by distance; first entry per label wins
        lbl_v = branch_labels[valid]
        euc_v = euc[valid]
        idx_v = np.nonzero(valid)[0]
        order = np.lexsort((euc_v, lbl_v))
        lbl_sorted = lbl_v[order]
        first = np.ones(len(order), bool)
        first[1:] = lbl_sorted[1:] != lbl_sorted[:-1]
        idxmin[lbl_sorted[first]] = idx_v[order[first]]
        return idxmin

    def _get_ref_coords(self, coords_a, coords_b, idxmin, t):
        branch_labels = np.asarray(self.branch_labels[t], np.int64)
        max_label = len(idxmin) - 1
        clipped = np.clip(branch_labels, 0, max_label)
        vals = idxmin[clipped]
        vals_no_nan = np.nan_to_num(vals, nan=0.0).astype(int)
        ref_a = coords_a[vals_no_nan].copy()
        ref_b = coords_b[vals_no_nan].copy()
        ref_a[np.isnan(vals)] = np.nan
        ref_b[np.isnan(vals)] = np.nan
        return ref_a, ref_b

    def _get_linear_velocity(self, ra, rb):
        dt = self.hierarchy.im_info.dim_res["T"]
        lin_vel = (rb - ra) / dt
        return lin_vel, np.linalg.norm(lin_vel, axis=1), None

    def _get_angular_velocity_2d(self, ra, rb):
        theta_a = np.arctan2(ra[:, 1], ra[:, 0])
        theta_b = np.arctan2(rb[:, 1], rb[:, 0])
        delta = (theta_b - theta_a + np.pi) % (2 * np.pi) - np.pi
        dt = self.hierarchy.im_info.dim_res["T"]
        ang_vel = delta / dt
        return ang_vel, np.abs(ang_vel), np.sign(ang_vel)

    def _get_angular_velocity_3d(self, ra, rb):
        cross = np.cross(ra, rb, axis=1)
        norm = np.linalg.norm(ra, axis=1) * np.linalg.norm(rb, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            ang_disp = (cross.T / norm.T).T
        ang_disp[norm == 0] = [np.nan] * 3
        dt = self.hierarchy.im_info.dim_res["T"]
        ang_vel = ang_disp / dt
        mag = np.linalg.norm(ang_vel, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            orient = (ang_vel.T / mag).T
        orient = np.where(np.isinf(orient), np.nan, orient)
        return ang_vel, mag, orient

    def _get_angular_velocity(self, ra, rb):
        if self.hierarchy.im_info.no_z:
            return self._get_angular_velocity_2d(ra, rb)
        return self._get_angular_velocity_3d(ra, rb)

    def _get_motility_stats(self, t, coords_1_px):
        h = self.hierarchy
        coords_1_px = coords_1_px.astype("float32")
        dims = 2 if h.im_info.no_z else 3
        n = len(coords_1_px)

        def nan_vec():
            return np.full((n, dims), np.nan, np.float32)

        def nan_arr():
            return np.full(n, np.nan, np.float32)

        if (not h.enable_motility or h.flow_interpolator_fw is None
                or h.flow_interpolator_bw is None or h.num_t is None or h.num_t < 2):
            self.vec01.append(nan_vec())
            self.vec12.append(nan_vec())
            self.linear_vel_vector.append(nan_vec())
            self.linear_vel.append(nan_arr())
            self.angular_vel_vector.append(nan_arr() if dims == 2 else nan_vec())
            self.angular_vel.append(nan_arr())
            self.rel_linear_vel.append(nan_arr())
            self.rel_angular_vel.append(nan_arr())
            self.rel_directionality.append(nan_arr())
            self.linear_acc.append(nan_arr())
            self.angular_acc.append(nan_arr())
            self.rel_linear_acc.append(nan_arr())
            self.rel_angular_acc.append(nan_arr())
            return

        spacing = np.asarray(h.spacing)
        vec01 = []
        vec12 = []
        if t > 0:
            vec01_px = h.flow_interpolator_bw.interpolate_coord(coords_1_px, t)
            vec01 = vec01_px * spacing
            self.vec01.append(vec01.astype(np.float32))
        else:
            self.vec01.append(nan_vec())
        if t < h.num_t - 1:
            vec12_px = h.flow_interpolator_fw.interpolate_coord(coords_1_px, t)
            vec12 = vec12_px * spacing
            self.vec12.append(vec12.astype(np.float32))
        else:
            self.vec12.append(nan_vec())

        coords_1 = coords_1_px * spacing

        if len(vec01) and len(vec12):
            coords_0 = (coords_1_px - vec01_px) * spacing
            lin_vel_01v, lin_vel_mag_01, _ = self._get_linear_velocity(coords_0, coords_1)
            ang_vel_01, _, _ = self._get_angular_velocity(coords_0, coords_1)
            idxmin01 = self._get_min_euc_dist(t, vec01)
            ref01 = self._get_ref_coords(coords_0, coords_1, idxmin01, t)
            ref01[0][np.isnan(vec01)] = np.nan
            ref01[1][np.isnan(vec01)] = np.nan
            r0_rel = coords_0 - ref01[0]
            r1_rel = coords_1 - ref01[1]
            lin_vel_rel_01v, _, _ = self._get_linear_velocity(r0_rel, r1_rel)
            ang_vel_rel_01, _, _ = self._get_angular_velocity(r0_rel, r1_rel)

        if len(vec12):
            coords_2 = (coords_1_px + vec12_px) * spacing
            lin_vel, lin_vel_mag, _ = self._get_linear_velocity(coords_1, coords_2)
            ang_vel, ang_vel_mag, _ = self._get_angular_velocity(coords_1, coords_2)
            idxmin12 = self._get_min_euc_dist(t, vec12)
            ref12 = self._get_ref_coords(coords_1, coords_2, idxmin12, t)
            ref12[0][np.isnan(vec12)] = np.nan
            ref12[1][np.isnan(vec12)] = np.nan
            r1_rel_12 = coords_1 - ref12[0]
            r2_rel_12 = coords_2 - ref12[1]
            lin_vel_rel, lin_vel_mag_rel, _ = self._get_linear_velocity(r1_rel_12, r2_rel_12)
            ang_vel_rel, ang_vel_mag_rel, _ = self._get_angular_velocity(r1_rel_12, r2_rel_12)

            r2m = np.linalg.norm(r2_rel_12, axis=1)
            r1m = np.linalg.norm(r1_rel_12, axis=1)
            denom = r2m + r1m
            directionality_rel = np.divide(
                np.abs(r2m - r1m), denom,
                out=np.full_like(denom, np.nan, dtype=np.float64), where=denom != 0)
        else:
            lin_vel, lin_vel_mag = nan_vec(), nan_arr()
            ang_vel_mag = nan_arr()
            lin_vel_rel, lin_vel_mag_rel = nan_vec(), nan_arr()
            ang_vel_mag_rel = nan_arr()
            directionality_rel = nan_arr()
            ang_vel = nan_arr() if dims == 2 else nan_vec()
            ang_vel_rel = nan_arr() if dims == 2 else nan_vec()

        self.linear_vel_vector.append(np.asarray(lin_vel, np.float32))
        self.linear_vel.append(np.asarray(lin_vel_mag, np.float32))
        self.angular_vel_vector.append(np.asarray(ang_vel, np.float32))
        self.angular_vel.append(np.asarray(ang_vel_mag, np.float32))
        self.rel_linear_vel.append(np.asarray(lin_vel_mag_rel, np.float32))
        self.rel_angular_vel.append(np.asarray(ang_vel_mag_rel, np.float32))
        self.rel_directionality.append(np.asarray(directionality_rel, np.float32))

        if len(vec01) and len(vec12):
            dt = h.im_info.dim_res["T"]
            lin_acc = (lin_vel - lin_vel_01v) / dt
            lin_acc_mag = np.linalg.norm(lin_acc, axis=1)
            ang_acc = (np.asarray(ang_vel) - np.asarray(ang_vel_01)) / dt
            lin_acc_rel = (lin_vel_rel - lin_vel_rel_01v) / dt
            lin_acc_rel_mag = np.linalg.norm(lin_acc_rel, axis=1)
            ang_acc_rel = (np.asarray(ang_vel_rel) - np.asarray(ang_vel_rel_01)) / dt
            if h.im_info.no_z:
                ang_acc_mag = np.abs(ang_acc)
                ang_acc_rel_mag = np.abs(ang_acc_rel)
            else:
                ang_acc_mag = np.linalg.norm(ang_acc, axis=1)
                ang_acc_rel_mag = np.linalg.norm(ang_acc_rel, axis=1)
        else:
            lin_acc_mag = nan_arr()
            ang_acc_mag = nan_arr()
            lin_acc_rel_mag = nan_arr()
            ang_acc_rel_mag = nan_arr()

        self.linear_acc.append(np.asarray(lin_acc_mag, np.float32))
        self.angular_acc.append(np.asarray(ang_acc_mag, np.float32))
        self.rel_linear_acc.append(np.asarray(lin_acc_rel_mag, np.float32))
        self.rel_angular_acc.append(np.asarray(ang_acc_rel_mag, np.float32))

    def _run_frame(self, t):
        h = self.hierarchy
        frame_coords = np.argwhere(np.asarray(h.label_components[t]) > 0)
        self.coords.append(frame_coords)
        self.component_labels.append(np.asarray(h.label_components[t])[tuple(frame_coords.T)])
        self.branch_labels.append(np.asarray(h.label_branches[t])[tuple(frame_coords.T)])
        self.intensity.append(np.asarray(h.im_raw[t])[tuple(frame_coords.T)])
        if not h.im_info.no_z:
            self.z.append(frame_coords[:, 0])
            self.y.append(frame_coords[:, 1])
            self.x.append(frame_coords[:, 2])
        else:
            self.z.append(np.full(len(frame_coords), np.nan))
            self.y.append(frame_coords[:, 0])
            self.x.append(frame_coords[:, 1])
        self.structure.append(np.asarray(h.im_struct[t])[tuple(frame_coords.T)])
        self.time.append(np.full(frame_coords.shape[0], t, int))
        self.image_name.append(
            np.full(frame_coords.shape[0], h.im_info.file_info.filename_no_ext, object))
        if not h.skip_nodes:
            self._get_node_info(t, frame_coords)
        self._get_motility_stats(t, frame_coords)

    def run(self):
        if self.hierarchy.num_t is None:
            self.hierarchy.num_t = 1
        for t in range(self.hierarchy.num_t):
            if self.hierarchy.viewer is not None:
                self.hierarchy.viewer.status = (
                    f"Extracting voxel features. Frame: {t + 1} of {self.hierarchy.num_t}.")
            self._run_frame(t)


class Nodes:
    """Node (skeleton voxel) features (reference hierarchical.py:1275-1441)."""

    def __init__(self, hierarchy: Hierarchy):
        self.hierarchy = hierarchy
        self.time = []
        self.nodes = []
        self.aggregate_voxel_metrics = []
        self.z = []
        self.y = []
        self.x = []
        self.node_thickness = []
        self.divergence = []
        self.convergence = []
        self.vergere = []
        self.stats_to_aggregate = ["divergence", "convergence", "vergere", "node_thickness"]
        self.features_to_save = self.stats_to_aggregate + ["x", "y", "z"]
        self.voxel_idxs = self.hierarchy.voxels.node_voxel_idxs
        self.branch_label = []
        self.component_label = []
        self.image_name = []

    def _get_aggregate_voxel_stats(self, t):
        self.aggregate_voxel_metrics.append(aggregate_stats_for_class(
            self.hierarchy.voxels, t, self.hierarchy.voxels.node_voxel_idxs[t],
            low_memory=self.hierarchy.low_memory))

    def _get_node_stats(self, t):
        h = self.hierarchy
        radius = distance_check(np.asarray(h.im_border_mask[t]), self.nodes[t], h.spacing)
        self.node_thickness.append(radius * 2)

        divergence, convergence, vergere = [], [], []
        z, y, x = [], [], []
        spacing = h.spacing
        for i, node in enumerate(self.nodes[t]):
            vox_idxs = self.voxel_idxs[t][i]
            if len(vox_idxs) == 0:
                for lst in (divergence, convergence, vergere, z, y, x):
                    lst.append(np.nan)
                continue
            coords_vox = h.voxels.coords[t][vox_idxs]
            if not h.im_info.no_z:
                z.append(np.nanmean(coords_vox[:, 0]) * spacing[0])
                y.append(np.nanmean(coords_vox[:, 1]) * spacing[1])
                x.append(np.nanmean(coords_vox[:, 2]) * spacing[2])
            else:
                z.append(np.nan)
                y.append(np.nanmean(coords_vox[:, 0]) * spacing[0])
                x.append(np.nanmean(coords_vox[:, 1]) * spacing[1])

            dist = (coords_vox - node).astype(float)
            mag = np.linalg.norm(dist, axis=1, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                direction = np.divide(dist, mag, out=np.full_like(dist, np.nan), where=mag != 0)
            vec01 = h.voxels.vec01[t][vox_idxs]
            vec12 = h.voxels.vec12[t][vox_idxs]
            dot01 = -np.nanmean(np.sum(-vec01 * direction, axis=1))
            convergence.append(dot01)
            dot12 = np.nanmean(np.sum(vec12 * direction, axis=1))
            divergence.append(dot12)
            vergere.append(dot01 + dot12)

        self.divergence.append(divergence)
        self.convergence.append(convergence)
        self.vergere.append(vergere)
        self.z.append(z)
        self.y.append(y)
        self.x.append(x)

    def _run_frame(self, t):
        h = self.hierarchy
        frame_skel_coords = np.argwhere(np.asarray(h.im_pixel_class[t]) > 0)
        self.nodes.append(frame_skel_coords)
        self.time.append(np.full(frame_skel_coords.shape[0], t, int))
        self.component_label.append(
            np.asarray(h.label_components[t])[tuple(frame_skel_coords.T)])
        self.branch_label.append(
            np.asarray(h.label_branches[t])[tuple(frame_skel_coords.T)])
        self.image_name.append(
            np.full(frame_skel_coords.shape[0], h.im_info.file_info.filename_no_ext, object))
        self._get_aggregate_voxel_stats(t)
        self._get_node_stats(t)

    def run(self):
        if self.hierarchy.skip_nodes:
            return
        for t in range(self.hierarchy.num_t):
            if self.hierarchy.viewer is not None:
                self.hierarchy.viewer.status = (
                    f"Extracting node features. Frame: {t + 1} of {self.hierarchy.num_t}.")
            self._run_frame(t)


class Branches:
    """Branch-level features (reference hierarchical.py:1444-1878)."""

    def __init__(self, hierarchy: Hierarchy):
        self.hierarchy = hierarchy
        self.time = []
        self.branch_label = []
        self.aggregate_voxel_metrics = []
        self.aggregate_node_metrics = []
        self.z = []
        self.y = []
        self.x = []
        self.branch_length = []
        self.branch_thickness = []
        self.branch_aspect_ratio = []
        self.branch_tortuosity = []
        self.branch_area = []
        self.branch_axis_length_maj = []
        self.branch_axis_length_min = []
        self.branch_extent = []
        self.branch_solidity = []
        self.reassigned_label = []
        self.branch_idxs = []
        self.component_label = []
        self.image_name = []

        self.stats_to_aggregate = [
            "branch_length", "branch_thickness", "branch_aspect_ratio",
            "branch_tortuosity", "branch_area", "branch_axis_length_maj",
            "branch_axis_length_min", "branch_extent", "branch_solidity",
            "reassigned_label",
        ]
        self.features_to_save = self.stats_to_aggregate + ["x", "y", "z"]

    def _get_aggregate_stats(self, t):
        voxel_labels = self.hierarchy.voxels.branch_labels[t]
        grouped = _group_indices_by_label(voxel_labels)
        self.aggregate_voxel_metrics.append(aggregate_stats_for_class(
            self.hierarchy.voxels, t, grouped, low_memory=self.hierarchy.low_memory))
        if not self.hierarchy.skip_nodes:
            node_labels = self.hierarchy.nodes.branch_label[t]
            grouped_nodes = _group_indices_by_label(node_labels)
            self.aggregate_node_metrics.append(aggregate_stats_for_class(
                self.hierarchy.nodes, t, grouped_nodes, low_memory=self.hierarchy.low_memory))

    def _branch_lengths_and_degrees(self, t):
        """Per-label centerline length + per-voxel same-label degree via a
        half-neighbourhood offset sweep (reference hierarchical.py:1515-1630)."""
        L = np.asarray(self.hierarchy.im_skel[t])
        spacing = self.hierarchy.spacing
        ndim = L.ndim
        max_label = int(L.max())
        lengths = np.zeros(max_label + 1, np.float32)
        degree = np.zeros(L.shape, np.uint8)

        import itertools

        offsets = []
        for off in itertools.product((-1, 0, 1), repeat=ndim):
            if all(o == 0 for o in off):
                continue
            # half neighbourhood: lexicographically positive offsets
            if off > (0,) * ndim:
                offsets.append(off)

        for off in offsets:
            src = tuple(slice(max(0, o), L.shape[d] + min(0, o)) for d, o in enumerate(off))
            dst = tuple(slice(max(0, -o), L.shape[d] - max(0, o)) for d, o in enumerate(off))
            base = L[src]
            neigh = L[dst]
            same = (base > 0) & (base == neigh)
            if not same.any():
                continue
            degree[src] += same.astype(np.uint8)
            degree[dst] += same.astype(np.uint8)
            edge_len = np.sqrt(sum((o * s) ** 2 for o, s in zip(off, spacing)))
            lengths += np.bincount(
                base[same].ravel(),
                weights=np.full(int(same.sum()), edge_len, np.float32),
                minlength=max_label + 1,
            ).astype(np.float32)
        return lengths, degree

    def _get_branch_stats(self, t):
        h = self.hierarchy
        branch_idxs_arr = np.asarray(self.branch_idxs[t])
        L = np.asarray(h.im_skel[t])
        spacing = h.spacing
        no_z = h.im_info.no_z

        label_lengths, degree = self._branch_lengths_and_degrees(t)
        unique_labels = np.unique(L[L > 0])
        if unique_labels.size == 0:
            for lst in (self.branch_tortuosity, self.branch_aspect_ratio,
                        self.branch_thickness, self.branch_length, self.branch_area,
                        self.branch_axis_length_maj, self.branch_axis_length_min,
                        self.branch_extent, self.branch_solidity, self.reassigned_label,
                        self.z, self.y, self.x):
                lst.append([])
            return

        deg_branch = degree[tuple(branch_idxs_arr.T)]
        tips = np.nonzero(deg_branch == 1)[0]
        lone_tips = np.nonzero(deg_branch == 0)[0]
        tip_coords = branch_idxs_arr[tips]
        lone_tip_coords = branch_idxs_arr[lone_tips]
        tip_labels = L[tuple(tip_coords.T)] if len(tip_coords) else np.array([], int)
        lone_tip_labels = L[tuple(lone_tip_coords.T)] if len(lone_tip_coords) else np.array([], int)

        radii = distance_check(np.asarray(h.im_border_mask[t]), branch_idxs_arr, spacing)
        tip_radii = radii[tips] if len(tips) else np.array([], float)
        lone_tip_radii = radii[lone_tips] if len(lone_tips) else np.array([], float)

        label_to_row = {int(lbl): i for i, lbl in enumerate(unique_labels)}
        base_lengths = label_lengths[unique_labels].astype(np.float32)
        for lbl, radius in zip(lone_tip_labels, lone_tip_radii):
            base_lengths[label_to_row[int(lbl)]] += 2.0 * radius
        for lbl, radius in zip(tip_labels, tip_radii):
            base_lengths[label_to_row[int(lbl)]] += radius

        # median thickness per label (sorted-group median)
        labels_vox = L[tuple(branch_idxs_arr.T)]
        thicknesses = radii * 2.0
        median_thickness = np.full(len(unique_labels), np.nan, np.float32)
        order = np.argsort(labels_vox, kind="stable")
        sl = labels_vox[order]
        st = thicknesses[order]
        uq, starts = np.unique(sl, return_index=True)
        ends = np.append(starts[1:], len(sl))
        for u, s, e in zip(uq, starts, ends):
            median_thickness[label_to_row[int(u)]] = np.median(st[s:e])

        swap = (~np.isnan(median_thickness)) & (median_thickness > base_lengths)
        median_thickness[swap], base_lengths[swap] = base_lengths[swap], median_thickness[swap].copy()

        aspect = np.divide(base_lengths, median_thickness,
                           out=np.full_like(base_lengths, np.nan), where=median_thickness != 0)

        tortuosity = np.ones(len(unique_labels), np.float32)
        for i, lbl in enumerate(unique_labels):
            coords_lbl = tip_coords[tip_labels == lbl]
            if coords_lbl.shape[0] >= 2:
                p0, p1 = coords_lbl[0], coords_lbl[1]
                tip_dist = np.sqrt(sum(((a - b) * s) ** 2
                                       for a, b, s in zip(p0, p1, spacing)))
                tortuosity[i] = base_lengths[i] / tip_dist if tip_dist > 0 else 1.0

        self.branch_tortuosity.append(tortuosity)
        self.branch_aspect_ratio.append(aspect)
        self.branch_thickness.append(median_thickness)
        self.branch_length.append(base_lengths)

        regions = regionprops(np.asarray(h.label_branches[t]).astype(np.int64), spacing=spacing)
        areas, maj, mino, extent, solidity, reassigned, z, y, x = ([] for _ in range(9))
        for region in regions:
            reassigned_region = np.nan
            if not h.im_info.no_t and h.im_branch_reassigned is not None:
                vals = np.asarray(h.im_branch_reassigned[t])[tuple(region.coords.T)]
                if vals.size > 0:
                    reassigned_region = np.argmax(np.bincount(vals))
            reassigned.append(reassigned_region)
            areas.append(region.area)
            maj.append(region.major_axis_length)
            mino.append(region.minor_axis_length)
            extent.append(region.extent)
            solidity.append(region.solidity)
            if not no_z:
                z.append(region.centroid[0])
                y.append(region.centroid[1])
                x.append(region.centroid[2])
            else:
                z.append(np.nan)
                y.append(region.centroid[0])
                x.append(region.centroid[1])
        self.branch_area.append(areas)
        self.branch_axis_length_maj.append(maj)
        self.branch_axis_length_min.append(mino)
        self.branch_extent.append(extent)
        self.branch_solidity.append(solidity)
        self.reassigned_label.append(reassigned)
        self.z.append(z)
        self.y.append(y)
        self.x.append(x)

    def _run_frame(self, t):
        h = self.hierarchy
        frame_branch_idxs = np.argwhere(np.asarray(h.im_skel[t]) > 0)
        self.branch_idxs.append(frame_branch_idxs)
        skel_labels = np.asarray(h.im_skel[t])[tuple(frame_branch_idxs.T)]

        if skel_labels.size == 0:
            self.time.append(np.array([], int))
            self.component_label.append(np.array([], int))
            self.branch_label.append(np.array([], int))
            self.image_name.append(np.array([], object))
            self.aggregate_voxel_metrics.append({})
            if not h.skip_nodes:
                self.aggregate_node_metrics.append({})
            for lst in (self.branch_length, self.branch_thickness, self.branch_aspect_ratio,
                        self.branch_tortuosity, self.branch_area, self.branch_axis_length_maj,
                        self.branch_axis_length_min, self.branch_extent, self.branch_solidity,
                        self.reassigned_label, self.z, self.y, self.x):
                lst.append([])
            return

        unique_branch_labels = np.unique(skel_labels)
        unique_branch_labels = unique_branch_labels[unique_branch_labels > 0]
        num_branches = len(unique_branch_labels)
        self.time.append(np.full(num_branches, t, int))

        dims = 2 if h.im_info.no_z else 3
        frame_branch_coords = np.zeros((num_branches, dims), int)
        for idx, lbl in enumerate(unique_branch_labels):
            voxels = frame_branch_idxs[skel_labels == lbl]
            if len(voxels):
                frame_branch_coords[idx] = voxels[0]
        self.component_label.append(
            np.asarray(h.label_components[t])[tuple(frame_branch_coords.T)])
        self.branch_label.append(unique_branch_labels.astype(int))
        self.image_name.append(np.full(num_branches, h.im_info.file_info.filename_no_ext, object))

        self._get_aggregate_stats(t)
        self._get_branch_stats(t)

    def run(self):
        for t in range(self.hierarchy.num_t):
            if self.hierarchy.viewer is not None:
                self.hierarchy.viewer.status = (
                    f"Extracting branch features. Frame: {t + 1} of {self.hierarchy.num_t}.")
            self._run_frame(t)


class Components:
    """Organelle-level features (reference hierarchical.py:1880-2043)."""

    def __init__(self, hierarchy: Hierarchy):
        self.hierarchy = hierarchy
        self.time = []
        self.component_label = []
        self.aggregate_voxel_metrics = []
        self.aggregate_node_metrics = []
        self.aggregate_branch_metrics = []
        self.z = []
        self.y = []
        self.x = []
        self.organelle_area = []
        self.organelle_axis_length_maj = []
        self.organelle_axis_length_min = []
        self.organelle_extent = []
        self.organelle_solidity = []
        self.reassigned_label = []
        self.image_name = []

        self.stats_to_aggregate = [
            "organelle_area", "organelle_axis_length_maj", "organelle_axis_length_min",
            "organelle_extent", "organelle_solidity", "reassigned_label",
        ]
        self.features_to_save = self.stats_to_aggregate + ["x", "y", "z"]

    def _get_aggregate_stats(self, t):
        h = self.hierarchy
        voxel_labels = h.voxels.component_labels[t]
        self.aggregate_voxel_metrics.append(aggregate_stats_for_class(
            h.voxels, t, _group_indices_by_label(voxel_labels), low_memory=h.low_memory))
        if not h.skip_nodes:
            node_labels = np.asarray(h.nodes.component_label[t])
            uniq = np.unique(voxel_labels)
            grouped = [np.nonzero(node_labels == lbl)[0] for lbl in uniq if lbl != 0]
            self.aggregate_node_metrics.append(aggregate_stats_for_class(
                h.nodes, t, grouped, low_memory=h.low_memory))
        branch_labels = np.asarray(h.branches.component_label[t])
        uniq = np.unique(voxel_labels)
        grouped = [np.nonzero(branch_labels == lbl)[0] for lbl in uniq if lbl != 0]
        self.aggregate_branch_metrics.append(aggregate_stats_for_class(
            h.branches, t, grouped, low_memory=h.low_memory))

    def _get_component_stats(self, t):
        h = self.hierarchy
        regions = regionprops(np.asarray(h.label_components[t]).astype(np.int64),
                              spacing=h.spacing)
        areas, maj, mino, extent, solidity, reassigned, z, y, x = ([] for _ in range(9))
        for region in regions:
            reassigned_region = np.nan
            if not h.im_info.no_t and h.im_obj_reassigned is not None:
                vals = np.asarray(h.im_obj_reassigned[t])[tuple(region.coords.T)]
                if vals.size > 0:
                    reassigned_region = np.argmax(np.bincount(vals))
            reassigned.append(reassigned_region)
            areas.append(region.area)
            maj.append(region.major_axis_length)
            mino.append(region.minor_axis_length)
            extent.append(region.extent)
            solidity.append(region.solidity)
            if not h.im_info.no_z:
                z.append(region.centroid[0])
                y.append(region.centroid[1])
                x.append(region.centroid[2])
            else:
                z.append(np.nan)
                y.append(region.centroid[0])
                x.append(region.centroid[1])
        self.organelle_area.append(areas)
        self.organelle_axis_length_maj.append(maj)
        self.organelle_axis_length_min.append(mino)
        self.organelle_extent.append(extent)
        self.organelle_solidity.append(solidity)
        self.reassigned_label.append(reassigned)
        self.z.append(z)
        self.y.append(y)
        self.x.append(x)

    def _run_frame(self, t):
        h = self.hierarchy
        component_labels_t = np.asarray(h.label_components[t])
        mask = component_labels_t > 0
        if not mask.any():
            self.component_label.append(np.array([], int))
            self.time.append(np.array([], int))
            self.image_name.append(np.array([], object))
            self.aggregate_voxel_metrics.append({})
            if not h.skip_nodes:
                self.aggregate_node_metrics.append({})
            self.aggregate_branch_metrics.append({})
            for lst in (self.organelle_area, self.organelle_axis_length_maj,
                        self.organelle_axis_length_min, self.organelle_extent,
                        self.organelle_solidity, self.reassigned_label,
                        self.z, self.y, self.x):
                lst.append([])
            return

        frame_component_labels = np.unique(component_labels_t[mask])
        self.component_label.append(frame_component_labels)
        num_components = len(frame_component_labels)
        self.time.append(np.full(num_components, t, int))
        self.image_name.append(
            np.full(num_components, h.im_info.file_info.filename_no_ext, object))
        self._get_aggregate_stats(t)
        self._get_component_stats(t)

    def run(self):
        for t in range(self.hierarchy.num_t):
            if self.hierarchy.viewer is not None:
                self.hierarchy.viewer.status = (
                    f"Extracting organelle features. Frame: {t + 1} of {self.hierarchy.num_t}.")
            self._run_frame(t)


class Image:
    """Whole-frame aggregations (reference hierarchical.py:2046-2128)."""

    def __init__(self, hierarchy: Hierarchy):
        self.hierarchy = hierarchy
        self.time = []
        self.image_name = []
        self.aggregate_voxel_metrics = []
        self.aggregate_node_metrics = []
        self.aggregate_branch_metrics = []
        self.aggregate_component_metrics = []
        self.stats_to_aggregate = []
        self.features_to_save = []

    def _get_aggregate_stats(self, t):
        h = self.hierarchy
        self.aggregate_voxel_metrics.append(aggregate_stats_for_class(
            h.voxels, t, [np.arange(len(h.voxels.coords[t]), dtype=int)],
            low_memory=h.low_memory))
        if not h.skip_nodes:
            self.aggregate_node_metrics.append(aggregate_stats_for_class(
                h.nodes, t, [np.arange(len(h.nodes.nodes[t]), dtype=int)],
                low_memory=h.low_memory))
        n_branches = len(h.branches.branch_length[t])
        self.aggregate_branch_metrics.append(aggregate_stats_for_class(
            h.branches, t, [np.arange(n_branches, dtype=int)], low_memory=h.low_memory))
        n_components = len(h.components.organelle_area[t])
        self.aggregate_component_metrics.append(aggregate_stats_for_class(
            h.components, t, [np.arange(n_components, dtype=int)], low_memory=h.low_memory))

    def _run_frame(self, t):
        self.time.append(t)
        self.image_name.append(self.hierarchy.im_info.file_info.filename_no_ext)
        self._get_aggregate_stats(t)

    def run(self):
        for t in range(self.hierarchy.num_t):
            if self.hierarchy.viewer is not None:
                self.hierarchy.viewer.status = (
                    f"Extracting image features. Frame: {t + 1} of {self.hierarchy.num_t}.")
            self._run_frame(t)
