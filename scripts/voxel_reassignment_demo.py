"""Demo: consume voxel_matches.npy + adjacency maps to build per-frame
branch/node t -> t+1 correspondence count matrices.

Rebuild of the reference demo (``/root/reference/scripts/
voxel_reassignment_demo.py``): shows how downstream analyses can turn
the raw voxel match pairs saved by VoxelReassigner into higher-level
correspondence statistics.
"""
from __future__ import annotations

import pickle
import sys

import numpy as np

from nellie_tpu.io.verifier import FileInfo, ImInfo


def accumulate_pair_counts(prev_labels, next_labels, n_prev=None, n_next=None):
    """Count matrix C[i, j] = #voxel matches from prev label i to next label j."""
    prev_labels = np.asarray(prev_labels, np.int64)
    next_labels = np.asarray(next_labels, np.int64)
    n_prev = n_prev or (int(prev_labels.max()) + 1 if prev_labels.size else 1)
    n_next = n_next or (int(next_labels.max()) + 1 if next_labels.size else 1)
    counts = np.zeros((n_prev, n_next), np.int64)
    np.add.at(counts, (prev_labels, next_labels), 1)
    return counts


def main(filepath):
    file_info = FileInfo(filepath)
    file_info.find_metadata()
    file_info.load_metadata()
    im_info = ImInfo(file_info)

    matches = np.load(im_info.pipeline_paths["voxel_matches"], allow_pickle=True)
    branch_memmap = im_info.get_memmap(im_info.pipeline_paths["im_branch_label_reassigned"])
    obj_memmap = im_info.get_memmap(im_info.pipeline_paths["im_obj_label_reassigned"])

    with open(im_info.pipeline_paths["adjacency_maps"], "rb") as f:
        adjacency = pickle.load(f)
    print(f"adjacency keys: {sorted(adjacency.keys())}")

    for t, (prev_vox, next_vox) in enumerate(matches):
        prev_vox = prev_vox.astype(np.int64)
        next_vox = next_vox.astype(np.int64)
        prev_branch = np.asarray(branch_memmap[t])[tuple(prev_vox.T)]
        next_branch = np.asarray(branch_memmap[t + 1])[tuple(next_vox.T)]
        prev_obj = np.asarray(obj_memmap[t])[tuple(prev_vox.T)]
        next_obj = np.asarray(obj_memmap[t + 1])[tuple(next_vox.T)]

        branch_counts = accumulate_pair_counts(prev_branch, next_branch)
        obj_counts = accumulate_pair_counts(prev_obj, next_obj)
        print(f"t={t}->{t+1}: {len(prev_vox)} voxel matches, "
              f"branch matrix {branch_counts.shape} "
              f"(diagonal mass {np.trace(branch_counts)}), "
              f"object matrix {obj_counts.shape} "
              f"(diagonal mass {np.trace(obj_counts)})")


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print("usage: python scripts/voxel_reassignment_demo.py <input.ome.tif>")
        sys.exit(1)
    main(sys.argv[1])
