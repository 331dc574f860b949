"""Demo writer: per-frame dataset emission in the recorded layout.

(reference: mindmap/isaaclab_utils/isaaclab_writer.py) The sim side (or any
data source) streams frames; the writer persists them in the demo format the
dataset reader consumes: RGB as uint8 PNG, depth as uint16-millimeter PNG,
poses/intrinsics/robot states as npy, plus the demo outcome flag.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from nvblox_mindmap_tpu.data.transforms import DEPTH_SCALE_FACTOR


class DemoWriter:
    def __init__(self, demo_dir: str):
        self.demo_dir = demo_dir
        os.makedirs(demo_dir, exist_ok=True)

    def _path(self, idx: int, item: str) -> str:
        return os.path.join(self.demo_dir, f"{idx}.{item}")

    def write_rgb(self, idx: int, camera: str, rgb: np.ndarray):
        """rgb: (H, W, 3) uint8 or float [0, 1]."""
        import imageio.v2 as imageio

        if rgb.dtype != np.uint8:
            rgb = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
        imageio.imwrite(self._path(idx, f"{camera}_rgb.png"), rgb)

    def write_depth(self, idx: int, camera: str, depth_m: np.ndarray):
        """depth_m: (H, W) metric depth -> uint16 millimeters."""
        import imageio.v2 as imageio

        depth_u16 = np.clip(depth_m * DEPTH_SCALE_FACTOR, 0, 65535).astype(
            np.uint16
        )
        imageio.imwrite(self._path(idx, f"{camera}_depth.png"), depth_u16)

    def write_camera_params(self, idx: int, camera: str, pose7: np.ndarray,
                            intrinsics: np.ndarray):
        np.save(self._path(idx, f"{camera}_pose.npy"),
                np.asarray(pose7, np.float32))
        np.save(self._path(idx, f"{camera}_intrinsics.npy"),
                np.asarray(intrinsics, np.float32))

    def write_semantic(self, idx: int, camera: str, segmentation: np.ndarray):
        """segmentation: (H, W) integer label ids -> uint8/uint16 PNG
        (reference: isaaclab_writer.py:126 write_semantic)."""
        import imageio.v2 as imageio

        seg = np.asarray(segmentation)
        assert seg.ndim == 2, "segmentation must be a (H, W) label image"
        dtype = np.uint8 if seg.max(initial=0) < 256 else np.uint16
        imageio.imwrite(
            self._path(idx, f"{camera}_semantic.png"), seg.astype(dtype)
        )

    def write_semantic_labels(self, id_to_class):
        """Persist the label-id -> class-name map the dynamic mask needs."""
        import json

        path = os.path.join(self.demo_dir, "semantic_labels.json")
        with open(path, "w") as f:
            json.dump({str(int(k)): str(v) for k, v in id_to_class.items()}, f)

    def write_robot_state(self, idx: int, robot_state: np.ndarray):
        np.save(self._path(idx, "robot_state.npy"),
                np.asarray(robot_state, np.float32))

    def write_camera_frame(self, idx: int, camera: str, rgb, depth_m, pose7,
                           intrinsics):
        """Convenience: all four per-camera items of one frame."""
        self.write_rgb(idx, camera, rgb)
        self.write_depth(idx, camera, depth_m)
        self.write_camera_params(idx, camera, pose7, intrinsics)

    def write_outcome(self, outcome_value: int):
        """1 SUCCESS / 0 FAILED_DATAGEN / -1 FAILED_GT_EVAL."""
        np.save(os.path.join(self.demo_dir, "demo_successful.npy"),
                np.asarray(outcome_value))
