"""Synthetic on-disk fixture trees for the TUM and IndoorLidar loaders.

The reference's loaders are exercised against its full datasets only in
ignored-by-default tests (reference src/io/dataset/tum.rs:182-190); the
datasets themselves are not redistributable. These builders write tiny
deterministic trees in the exact on-disk formats
(tum.rs:41-68 association inputs; indoor_lidar.rs:34-77 .log pose blocks)
so the parsers are pinned in CI without any external data.

Scene: a textured slanted plane at ~1 m; frame k is the plane viewed from a
camera translated k*5 mm along +x — so adjacent frames genuinely align and
odometry can smoke-run on the trees.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

H, W = 120, 160


def _scene_images(k: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """(rgb u8 (H,W,3), depth u16 (H,W)) of the plane seen from frame k."""
    rng = np.random.default_rng(seed)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    # Smooth textured plane; shift texture + depth by k pixels (camera slides).
    base = rng.uniform(40, 210, size=(H, W + 16)).astype(np.float32)
    # Blur the texture a bit so photometric ICP has gradients, not noise.
    tex = (base[:, k : k + W] + base[:, k + 1 : k + 1 + W]) * 0.5
    rgb = np.stack([tex, tex, tex], axis=-1).astype(np.uint8)
    depth = (1000 + 2 * (xs + k) + ys).astype(np.uint16)
    depth[:4, :4] = 0  # a hole, so zero-depth masking is exercised
    return rgb, depth


def _save_depth_png(path: str, depth: np.ndarray) -> None:
    Image.fromarray(depth.astype(np.uint16)).save(path)


def _quat_wxyz_about_z(angle: float) -> tuple[float, float, float, float]:
    return (np.cos(angle / 2), 0.0, 0.0, np.sin(angle / 2))


# Ground-truth camera poses for frame k: translation k*0.005 m along x,
# tiny rotation about z so quaternion parsing is non-trivial.
def gt_pose_tuple(k: int) -> tuple[np.ndarray, np.ndarray]:
    """(translation (3,), quat wxyz (4,)) of frame k's camera_to_world."""
    t = np.array([0.005 * k, 0.0, 0.0], np.float32)
    w, x, y, z = _quat_wxyz_about_z(0.002 * k)
    return t, np.array([w, x, y, z], np.float32)


def make_tum_tree(base: str, n_frames: int = 4) -> str:
    """Write a TUM-format tree with deliberately offset timestamps.

    Layout (tum.rs inputs): rgb.txt / depth.txt / groundtruth.txt +
    rgb/*.png + depth/*.png.  Timestamps are staggered so the two-pointer
    +-0.02 s association is genuinely exercised:

    * depth frame k at t = 10.0 + 0.1k
    * rgb   frame k at t = depth_t + 0.015 (inside the window)
    * one extra rgb at t = 9.5 and one depth at t = 99.0 — both unmatched
    * groundtruth rows every 0.05 s (2x rate), nearest within 0.015 s
    """
    os.makedirs(os.path.join(base, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(base, "depth"), exist_ok=True)

    rgb_rows = ["# color images", "# timestamp filename"]
    depth_rows = ["# depth images"]
    # Unmatched leading rgb entry (no depth within 0.02 s).
    stray = np.zeros((H, W, 3), np.uint8)
    Image.fromarray(stray).save(os.path.join(base, "rgb", "stray.png"))
    rgb_rows.append("9.500000 rgb/stray.png")

    for k in range(n_frames):
        rgb, depth = _scene_images(k)
        t_depth = 10.0 + 0.1 * k
        t_rgb = t_depth + 0.015
        rgb_name = f"rgb/{t_rgb:.6f}.png"
        depth_name = f"depth/{t_depth:.6f}.png"
        Image.fromarray(rgb).save(os.path.join(base, rgb_name))
        _save_depth_png(os.path.join(base, depth_name), depth)
        rgb_rows.append(f"{t_rgb:.6f} {rgb_name}")
        depth_rows.append(f"{t_depth:.6f} {depth_name}")

    # Unmatched trailing depth entry.
    _save_depth_png(os.path.join(base, "depth", "stray.png"), np.zeros((H, W), np.uint16))
    depth_rows.append("99.000000 depth/stray.png")

    gt_rows = ["# ground truth trajectory", "# timestamp tx ty tz qx qy qz qw"]
    for k in range(n_frames):
        # GT timestamp offset -0.005 s from the depth timestamp (inside window).
        t = 10.0 + 0.1 * k - 0.005
        tr, q = gt_pose_tuple(k)
        w, x, y, z = q
        gt_rows.append(
            f"{t:.6f} {tr[0]:.6f} {tr[1]:.6f} {tr[2]:.6f} "
            f"{x:.6f} {y:.6f} {z:.6f} {w:.6f}"
        )

    with open(os.path.join(base, "rgb.txt"), "w") as f:
        f.write("\n".join(rgb_rows) + "\n")
    with open(os.path.join(base, "depth.txt"), "w") as f:
        f.write("\n".join(depth_rows) + "\n")
    with open(os.path.join(base, "groundtruth.txt"), "w") as f:
        f.write("\n".join(gt_rows) + "\n")
    return base


def make_indoor_lidar_tree(base: str, n_frames: int = 4) -> str:
    """Write an IndoorLidar (Redwood) tree: image/*.jpg + depth/*.png +
    ``<dirname>.log`` with 5-line pose blocks (indoor_lidar.rs:34-77)."""
    os.makedirs(os.path.join(base, "image"), exist_ok=True)
    os.makedirs(os.path.join(base, "depth"), exist_ok=True)

    log_lines = []
    for k in range(n_frames):
        rgb, depth = _scene_images(k)
        Image.fromarray(rgb).save(
            os.path.join(base, "image", f"{k:06d}.jpg"), quality=95
        )
        _save_depth_png(os.path.join(base, "depth", f"{k:06d}.png"), depth)
        tr, q = gt_pose_tuple(k)
        w, x, y, z = q
        # 4x4 camera_to_world from the quaternion (rotation about z).
        c, s = 1 - 2 * (y * y + z * z), 2 * (w * z)
        mat = np.eye(4, dtype=np.float64)
        mat[0, 0] = c
        mat[0, 1] = -s
        mat[1, 0] = s
        mat[1, 1] = c
        mat[:3, 3] = tr
        log_lines.append(f"{k} {k} {k + 1}")
        for row in mat:
            log_lines.append(" ".join(f"{v:.8f}" for v in row))

    name = os.path.basename(os.path.normpath(base))
    with open(os.path.join(base, f"{name}.log"), "w") as f:
        f.write("\n".join(log_lines) + "\n")
    return base
