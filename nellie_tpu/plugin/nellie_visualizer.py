"""Visualize tab: open artifacts as layers, view tracks.

Reference: ``nellie_napari/nellie_visualizer.py`` — raw/preprocessed/
segmentation/mocap/reassigned layers with µm scale, a 2D/3D toggle, and
track visualisation for a clicked label or all labels driven by
``LabelTracks``; buttons gate on artifact existence.
"""
from __future__ import annotations

import os

import numpy as np
from qtpy.QtWidgets import QCheckBox, QLabel, QPushButton, QSpinBox, QVBoxLayout, QWidget

from nellie_tpu.stages.all_tracks_for_label import LabelTracks
from nellie_tpu.stages.flow_vector_viz import load_flow_vectors_as_tracks


class NellieVisualizer(QWidget):
    def __init__(self, napari_viewer, nellie, parent=None):
        super().__init__(parent)
        self.viewer = napari_viewer
        self.nellie = nellie
        self.initialized = False

        layout = QVBoxLayout()
        self.buttons = {}
        for key, label, fn in (
            ("raw", "Open raw image", self.open_raw),
            ("im_preprocessed", "Open preprocessed", self.open_preprocess_image),
            ("im_instance_label", "Open segmentation", self.open_segment_image),
            ("im_skel_relabelled", "Open branch labels", self.open_branch_image),
            ("im_marker", "Open mocap markers", self.open_mocap_image),
            ("im_obj_label_reassigned", "Open reassigned labels", self.open_reassign_image),
            ("flow", "Open flow vectors", self.open_flow_vectors),
        ):
            button = QPushButton(label)
            button.clicked.connect(fn)
            layout.addWidget(button)
            self.buttons[key] = button

        self.check_3d_box = QCheckBox("3D view")
        self.check_3d_box.stateChanged.connect(self.check_3d)
        layout.addWidget(self.check_3d_box)

        layout.addWidget(QLabel("Track visualization"))
        self.track_label_spin = QSpinBox()
        self.track_label_spin.setRange(0, 2**31 - 1)
        layout.addWidget(self.track_label_spin)
        self.track_button = QPushButton("Track selected label")
        self.track_button.clicked.connect(self.on_track_selected)
        layout.addWidget(self.track_button)
        self.track_all_button = QPushButton("Track all labels")
        self.track_all_button.clicked.connect(self.track_all)
        layout.addWidget(self.track_all_button)

        layout.addStretch()
        self.setLayout(layout)

    def post_init(self):
        self.check_file_existence()

    # -- helpers --------------------------------------------------------------
    def _im_info(self):
        return self.nellie.im_info

    def set_scale(self):
        im_info = self._im_info()
        if im_info.no_z:
            return (1, im_info.dim_res["Y"], im_info.dim_res["X"])
        return (1, im_info.dim_res["Z"], im_info.dim_res["Y"], im_info.dim_res["X"])

    def check_3d(self):
        self.viewer.dims.ndisplay = 3 if self.check_3d_box.isChecked() else 2

    def check_file_existence(self):
        im_info = self._im_info()
        if im_info is None:
            for b in self.buttons.values():
                b.setEnabled(False)
            return
        self.buttons["raw"].setEnabled(os.path.exists(im_info.im_path))
        for key in ("im_preprocessed", "im_instance_label", "im_skel_relabelled",
                    "im_marker", "im_obj_label_reassigned"):
            self.buttons[key].setEnabled(os.path.exists(im_info.pipeline_paths[key]))
        flow_ok = os.path.exists(im_info.pipeline_paths["flow_vector_array"])
        self.buttons["flow"].setEnabled(flow_ok)
        self.track_button.setEnabled(flow_ok)
        self.track_all_button.setEnabled(flow_ok)

    def _add_image(self, path, name, **kwargs):
        im_info = self._im_info()
        data = im_info.get_memmap(path)
        self.viewer.add_image(np.asarray(data), name=name, scale=self.set_scale(), **kwargs)

    def _add_labels(self, path, name):
        im_info = self._im_info()
        data = im_info.get_memmap(path)
        layer = self.viewer.add_labels(np.asarray(data).astype(np.int32), name=name,
                                       scale=self.set_scale())
        # clicking a labeled voxel shows its hierarchy rows in the Analyze tab
        try:
            self.nellie.analyzer.attach_click_lookup(layer)
        except Exception:  # noqa: BLE001 — analysis tab may not be live yet
            pass

    # -- layer openers ------------------------------------------------------------
    def open_raw(self):
        self._add_image(self._im_info().im_path, "raw")

    def open_preprocess_image(self):
        self._add_image(self._im_info().pipeline_paths["im_preprocessed"], "preprocessed")

    def open_segment_image(self):
        self._add_labels(self._im_info().pipeline_paths["im_instance_label"], "segmentation")

    def open_branch_image(self):
        self._add_labels(self._im_info().pipeline_paths["im_skel_relabelled"], "branches")

    def open_mocap_image(self):
        im_info = self._im_info()
        data = np.asarray(im_info.get_memmap(im_info.pipeline_paths["im_marker"]))
        coords = np.argwhere(data > 0)
        self.viewer.add_points(coords, name="mocap markers", size=2, scale=self.set_scale())

    def open_reassign_image(self):
        self._add_labels(self._im_info().pipeline_paths["im_obj_label_reassigned"],
                         "reassigned labels")

    def open_flow_vectors(self):
        im_info = self._im_info()
        tracks, props = load_flow_vectors_as_tracks(im_info)
        if len(tracks):
            self.viewer.add_tracks(tracks, properties=props, name="flow vectors",
                                   scale=self.set_scale()[1:])

    # -- tracks ---------------------------------------------------------------
    def _track(self, label_num=None):
        im_info = self._im_info()
        cfg = self.nellie.settings.to_config()
        skip = cfg.skip_vox if cfg.subsample_voxels else 1
        label_tracks = LabelTracks(im_info)
        label_tracks.initialize()
        all_tracks = []
        all_props = {}
        max_track_num = 0
        num_t = im_info.shape[0]
        frames = range(num_t) if cfg.track_all_frames else [0]
        for frame in frames:
            tracks, props = label_tracks.run(
                label_num=label_num, start_frame=frame, end_frame=None,
                min_track_num=max_track_num, skip_coords=skip)
            all_tracks += tracks
            for key, values in props.items():
                all_props.setdefault(key, []).extend(values)
            if not tracks:
                continue
            max_track_num = max(track[0] for track in tracks) + 1
        if all_tracks:
            self.viewer.add_tracks(all_tracks, properties=all_props, name="tracks",
                                   scale=self.set_scale()[1:])

    def on_track_selected(self):
        self._track(label_num=self.track_label_spin.value() or None)

    def track_all(self):
        self._track(label_num=None)
