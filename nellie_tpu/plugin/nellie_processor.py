"""Process tab: per-stage buttons + the "Run Nellie" full-pipeline chain.

Reference: ``nellie_napari/nellie_processor.py`` — each step runs in a
napari ``@thread_worker`` looping over the batch's files, steps chain via
``next_step`` callbacks, buttons gate on artifact existence (the
filesystem IS the resume frontier), and a QTimer ticks a status display.
"""
from __future__ import annotations

import os
import time

from napari.qt.threading import thread_worker
from qtpy.QtCore import QTimer
from qtpy.QtWidgets import QHBoxLayout, QLabel, QPushButton, QVBoxLayout, QWidget

from nellie_tpu.plugin import config as cfg_mod
from nellie_tpu.stages.filtering import Filter
from nellie_tpu.stages.hierarchical import Hierarchy
from nellie_tpu.stages.hu_tracking import HuMomentTracking
from nellie_tpu.stages.labelling import Label
from nellie_tpu.stages.mocap_marking import Markers
from nellie_tpu.stages.networking import Network
from nellie_tpu.stages.voxel_reassignment import VoxelReassigner


class NellieProcessor(QWidget):
    def __init__(self, napari_viewer, nellie, parent=None):
        super().__init__(parent)
        self.viewer = napari_viewer
        self.nellie = nellie
        self.initialized = False
        self._worker = None
        self._pipeline_active = False

        layout = QVBoxLayout()
        self.status_label = QLabel("Status: idle")
        layout.addWidget(self.status_label)

        self.run_all_button = QPushButton("Run Nellie")
        self.run_all_button.clicked.connect(self.run_nellie)
        layout.addWidget(self.run_all_button)

        self.step_buttons = {}
        for key, label, fn in (
            ("preprocess", "Preprocess (Frangi)", self.run_preprocessing),
            ("segment", "Segment (Label + Network)", self.run_segmentation),
            ("mocap", "Mocap markers", self.run_mocap),
            ("track", "Track (Hu moments)", self.run_tracking),
            ("reassign", "Reassign voxels", self.run_reassign),
            ("features", "Extract features", self.run_feature_export),
        ):
            row = QHBoxLayout()
            button = QPushButton(label)
            button.clicked.connect(fn)
            row.addWidget(button)
            self.step_buttons[key] = button
            layout.addLayout(row)

        self.open_dir_button = QPushButton("Open output directory")
        self.open_dir_button.clicked.connect(self.open_directory)
        layout.addWidget(self.open_dir_button)

        layout.addStretch()
        self.setLayout(layout)

        self._status_base = "idle"
        self._ticks = 0
        self.status_timer = QTimer(self)
        self.status_timer.timeout.connect(self.update_status)

    # -- gating ------------------------------------------------------------------
    def post_init(self):
        self.check_file_existence()

    def _exists(self, key):
        im_info = self.nellie.im_info
        return im_info is not None and os.path.exists(im_info.pipeline_paths[key])

    def check_file_existence(self):
        """Button gating by artifact existence (the resume frontier)."""
        im_info = self.nellie.im_info
        ready = im_info is not None
        self.step_buttons["preprocess"].setEnabled(ready)
        self.step_buttons["segment"].setEnabled(ready and self._exists("im_preprocessed"))
        self.step_buttons["mocap"].setEnabled(ready and self._exists("im_instance_label"))
        self.step_buttons["track"].setEnabled(ready and self._exists("im_marker"))
        self.step_buttons["reassign"].setEnabled(ready and self._exists("flow_vector_array"))
        self.step_buttons["features"].setEnabled(ready and self._exists("im_skel_relabelled"))
        self.run_all_button.setEnabled(ready)
        if ready and self._exists("features_organelles"):
            self.nellie.enable_analysis()

    # -- worker plumbing -----------------------------------------------------------
    def _start_worker(self, worker, status, next_step=None):
        self._worker = worker
        self._status_base = status
        self._ticks = 0
        self.status_timer.start(500)
        self.turn_off_buttons()

        def on_finished():
            self.status_timer.stop()
            self.status_label.setText(f"Status: finished {status}")
            self.check_file_existence()
            self.turn_on_buttons()
            if next_step is not None and self._pipeline_active:
                next_step()

        def on_errored(exc):
            self.status_timer.stop()
            self._pipeline_active = False
            self.status_label.setText(f"Status: ERROR in {status}: {exc}")
            self.turn_on_buttons()

        worker.finished.connect(on_finished)
        worker.errored.connect(on_errored)
        worker.start()

    def update_status(self):
        self._ticks += 1
        dots = "." * (self._ticks % 4)
        self.status_label.setText(f"Status: running {self._status_base}{dots}")

    def turn_off_buttons(self):
        for b in self.step_buttons.values():
            b.setEnabled(False)
        self.run_all_button.setEnabled(False)

    def turn_on_buttons(self):
        self.run_all_button.setEnabled(True)
        self.check_file_existence()

    # -- steps ------------------------------------------------------------------
    def _settings(self):
        return self.nellie.settings.to_config()

    def run_preprocessing(self, next_step=None):
        cfg = self._settings()
        params = cfg_mod.preprocessing_params(cfg)
        params["remove_edges"] = cfg.remove_edges
        im_info_list = self.nellie.im_info_list
        viewer = self.viewer

        @thread_worker
        def _run():
            for im_info in im_info_list:
                Filter(im_info, viewer=viewer, **params).run()

        self._start_worker(_run(), "preprocessing", next_step)

    def run_segmentation(self, next_step=None):
        cfg = self._settings()
        label_params = cfg_mod.segmentation_label_params(cfg)
        network_params = cfg_mod.segmentation_network_params(cfg)
        im_info_list = self.nellie.im_info_list
        viewer = self.viewer

        @thread_worker
        def _run():
            for im_info in im_info_list:
                Label(im_info, viewer=viewer, **label_params).run()
                Network(im_info, viewer=viewer, **network_params).run()

        self._start_worker(_run(), "segmentation", next_step)

    def run_mocap(self, next_step=None):
        cfg = self._settings()
        params = cfg_mod.mocap_params(cfg)
        im_info_list = self.nellie.im_info_list
        viewer = self.viewer

        @thread_worker
        def _run():
            for im_info in im_info_list:
                Markers(im_info, viewer=viewer, **params).run()

        self._start_worker(_run(), "mocap marking", next_step)

    def run_tracking(self, next_step=None):
        cfg = self._settings()
        params = cfg_mod.tracking_params(cfg)
        im_info_list = self.nellie.im_info_list
        viewer = self.viewer

        @thread_worker
        def _run():
            for im_info in im_info_list:
                HuMomentTracking(im_info, viewer=viewer, **params).run()

        self._start_worker(_run(), "tracking", next_step)

    def run_reassign(self, next_step=None):
        cfg = self._settings()
        params = cfg_mod.reassign_params(cfg)
        im_info_list = self.nellie.im_info_list
        viewer = self.viewer

        @thread_worker
        def _run():
            for im_info in im_info_list:
                VoxelReassigner(im_info, viewer=viewer, **params).run()

        self._start_worker(_run(), "voxel reassignment", next_step)

    def run_feature_export(self, next_step=None):
        cfg = self._settings()
        params = cfg_mod.feature_params(cfg)
        remove_intermediates = cfg.remove_intermediates
        im_info_list = self.nellie.im_info_list
        viewer = self.viewer

        @thread_worker
        def _run():
            for im_info in im_info_list:
                Hierarchy(im_info, viewer=viewer, **params).run()
                if remove_intermediates:
                    im_info.remove_intermediates()

        def post():
            self._pipeline_active = False
            self.nellie.enable_analysis()
            try:
                self.nellie.analyzer.rewrite_dropdown()
            except Exception:  # noqa: BLE001
                pass

        self._start_worker(_run(), "feature extraction", post)

    def run_nellie(self):
        """Full pipeline chained via next_step callbacks."""
        self._pipeline_active = True
        cfg = self._settings()

        def after_tracking():
            if cfg.voxel_reassign:
                self.run_reassign(next_step=self.run_feature_export)
            else:
                self.run_feature_export()

        self.run_preprocessing(
            next_step=lambda: self.run_segmentation(
                next_step=lambda: self.run_mocap(
                    next_step=lambda: self.run_tracking(next_step=after_tracking))))

    def open_directory(self):
        im_info = self.nellie.im_info
        if im_info is None:
            return
        import subprocess
        import sys

        path = im_info.file_info.output_dir
        if sys.platform == "darwin":
            subprocess.Popen(["open", path])
        elif sys.platform.startswith("linux"):
            subprocess.Popen(["xdg-open", path])
        else:
            os.startfile(path)  # type: ignore[attr-defined]
