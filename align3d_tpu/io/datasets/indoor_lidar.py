"""IndoorLidar (Redwood) dataset loader (reference ``src/io/dataset/indoor_lidar.rs``).

Format: http://redwood-data.org/indoor_lidar_rgbd — ``image/*.jpg`` +
``depth/*.png`` + a ``<name>.log`` of 5-line pose blocks (4x4 matrices).
Depth scale 0.001, hardcoded freiburg-style intrinsics.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from align3d_tpu.camera import CameraIntrinsics
from align3d_tpu.image import RgbdFrame, RgbdImage
from align3d_tpu.io.datasets.core import DatasetError, load_depth_u16, load_rgb
from align3d_tpu.se3 import Transform
from align3d_tpu.trajectory import Trajectory

_INTRINSICS = CameraIntrinsics(
    fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480
)


class IndoorLidarDataset:
    def __init__(self, rgb_images, depth_images, trajectory):
        self.rgb_images = rgb_images
        self.depth_images = depth_images
        self._trajectory = trajectory

    @classmethod
    def load(cls, base_dir: str) -> "IndoorLidarDataset":
        rgb_images = sorted(glob.glob(os.path.join(base_dir, "image", "*.jpg")))
        depth_images = sorted(glob.glob(os.path.join(base_dir, "depth", "*.png")))
        if len(rgb_images) != len(depth_images):
            raise DatasetError("Number of RGB and depth images do not match")

        log_name = os.path.basename(os.path.normpath(base_dir))
        log_path = os.path.join(base_dir, f"{log_name}.log")
        try:
            with open(log_path) as f:
                lines = [ln.strip() for ln in f if ln.strip()]
        except OSError as e:
            raise DatasetError(str(e)) from e

        poses = []
        for block_start in range(0, len(lines) - 4, 5):
            mat = np.zeros((4, 4), np.float32)
            for i in range(4):
                mat[i] = [float(t) for t in lines[block_start + 1 + i].split()]
            poses.append(Transform.from_matrix4(mat))
        trajectory = Trajectory.from_list(
            poses, np.arange(len(poses), dtype=np.float32)
        )
        return cls(rgb_images, depth_images, trajectory)

    def __len__(self) -> int:
        return len(self.rgb_images)

    def frame_paths(self) -> tuple[list, list]:
        """Absolute (color, depth) file paths — enables the native
        prefetching loader (io/native_loader.py)."""
        return list(self.rgb_images), list(self.depth_images)

    def get(self, index: int) -> RgbdFrame:
        rgb = load_rgb(self.rgb_images[index])
        depth = load_depth_u16(self.depth_images[index])
        cam, pose = self.camera(index)
        return RgbdFrame(
            camera=cam, image=RgbdImage(rgb, depth, 0.001), camera_to_world=pose
        )

    def get_meta(self, index: int):
        """(camera, pose, depth_scale) without decoding images."""
        cam, pose = self.camera(index)
        return cam, pose, 0.001

    def trajectory(self) -> Trajectory:
        return self._trajectory

    def camera(self, index: int):
        return _INTRINSICS, self._trajectory.camera_to_world[index]
