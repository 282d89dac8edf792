"""TUM + IndoorLidar loader tests on synthetic on-disk fixture trees.

Pins the parsers the reference only exercises against full external datasets
(reference src/io/dataset/tum.rs:41-68 two-pointer association;
indoor_lidar.rs:34-77 .log pose blocks) — see tests/_dataset_fixtures.py.
"""

import numpy as np
import pytest

from tests._dataset_fixtures import (
    H,
    W,
    _scene_images,
    gt_pose_tuple,
    make_indoor_lidar_tree,
    make_tum_tree,
)


@pytest.fixture(scope="module")
def tum_tree(tmp_path_factory):
    return make_tum_tree(str(tmp_path_factory.mktemp("tum_fix")))


@pytest.fixture(scope="module")
def il_tree(tmp_path_factory):
    return make_indoor_lidar_tree(str(tmp_path_factory.mktemp("il_fix")))


class TestTum:
    def test_association_drops_unmatched(self, tum_tree):
        from align3d_tpu.io.datasets import TumRgbdDataset

        ds = TumRgbdDataset.load(tum_tree)
        # 4 matched pairs; the stray rgb (9.5 s) and stray depth (99 s) drop.
        assert len(ds) == 4
        assert all("stray" not in f for f in ds.rgb_images)
        assert all("stray" not in f for f in ds.depth_images)
        # Association pairs depth k with rgb k despite the +0.015 s offset.
        for k, (rgb_f, dep_f) in enumerate(zip(ds.rgb_images, ds.depth_images)):
            assert f"{10.0 + 0.1 * k + 0.015:.6f}" in rgb_f
            assert f"{10.0 + 0.1 * k:.6f}" in dep_f

    def test_association_window_excludes_boundary(self, tmp_path):
        """|dt| must be < 0.02 strictly (tum.rs:52)."""
        from align3d_tpu.io.datasets.tum import _associate

        first = [(1.0, "a")]
        assert _associate(first, [(1.02, "x")]) == []
        got = _associate(first, [(1.019, "x")])
        assert len(got) == 1 and got[0][1] == "a" and got[0][3] == "x"

    def test_frame_contents(self, tum_tree):
        from align3d_tpu.io.datasets import TumRgbdDataset

        ds = TumRgbdDataset.load(tum_tree)
        frame = ds.get(2)
        assert frame.image.depth.shape == (H, W)
        assert frame.image.color.shape == (H, W, 3)
        assert frame.image.depth_scale == pytest.approx(1.0 / 5000.0)
        _, depth_expected = _scene_images(2)
        np.testing.assert_array_equal(np.asarray(frame.image.depth), depth_expected)
        # Hardcoded freiburg intrinsics (tum.rs:166-173).
        cam, pose = ds.camera(0)
        assert (cam.fx, cam.fy, cam.cx, cam.cy) == (525.0, 525.0, 319.5, 239.5)

    def test_trajectory_poses(self, tum_tree):
        from align3d_tpu.io.datasets import TumRgbdDataset

        ds = TumRgbdDataset.load(tum_tree)
        traj = ds.trajectory()
        assert len(traj) == 4
        for k in range(4):
            tr, q = gt_pose_tuple(k)
            pose = traj[k]
            np.testing.assert_allclose(np.asarray(pose.translation), tr, atol=1e-6)
            got_q = np.asarray(pose.to_quat())
            # Quaternion sign ambiguity.
            if got_q[0] * q[0] < 0:
                got_q = -got_q
            np.testing.assert_allclose(got_q, q, atol=1e-5)

    def test_missing_files_raise(self, tmp_path):
        from align3d_tpu.io.datasets import TumRgbdDataset
        from align3d_tpu.io.datasets.core import DatasetError

        with pytest.raises(DatasetError):
            TumRgbdDataset.load(str(tmp_path / "nope"))

    def test_subset_rebases(self, tum_tree):
        from align3d_tpu.io.datasets import SubsetDataset, TumRgbdDataset

        ds = SubsetDataset(TumRgbdDataset.load(tum_tree), [1, 3])
        assert len(ds) == 2
        traj = ds.trajectory()
        assert len(traj) == 2
        tr1, _ = gt_pose_tuple(1)
        tr3, _ = gt_pose_tuple(3)
        np.testing.assert_allclose(np.asarray(traj[0].translation), tr1, atol=1e-6)
        np.testing.assert_allclose(np.asarray(traj[1].translation), tr3, atol=1e-6)


class TestIndoorLidar:
    def test_load_counts_and_scale(self, il_tree):
        from align3d_tpu.io.datasets import IndoorLidarDataset

        ds = IndoorLidarDataset.load(il_tree)
        assert len(ds) == 4
        frame = ds.get(1)
        assert frame.image.depth_scale == pytest.approx(0.001)
        _, depth_expected = _scene_images(1)
        np.testing.assert_array_equal(np.asarray(frame.image.depth), depth_expected)
        cam, _ = ds.camera(0)
        assert (cam.fx, cam.fy, cam.cx, cam.cy) == (525.0, 525.0, 319.5, 239.5)

    def test_log_pose_blocks(self, il_tree):
        from align3d_tpu.io.datasets import IndoorLidarDataset

        ds = IndoorLidarDataset.load(il_tree)
        traj = ds.trajectory()
        assert len(traj) == 4
        for k in range(4):
            tr, q = gt_pose_tuple(k)
            pose = traj[k]
            np.testing.assert_allclose(
                np.asarray(pose.translation), tr, atol=1e-6
            )
            got_q = np.asarray(pose.to_quat())
            if got_q[0] * q[0] < 0:
                got_q = -got_q
            np.testing.assert_allclose(got_q, q, atol=1e-4)

    def test_count_mismatch_raises(self, tmp_path):
        import os

        from PIL import Image

        from align3d_tpu.io.datasets import IndoorLidarDataset
        from align3d_tpu.io.datasets.core import DatasetError

        base = tmp_path / "bad"
        os.makedirs(base / "image")
        os.makedirs(base / "depth")
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(base / "image" / "0.jpg")
        with pytest.raises(DatasetError):
            IndoorLidarDataset.load(str(base))


class TestCliSmoke:
    """Odometry CLI smoke-runs end-to-end on both fixture trees
    (reference examples/src/bin/odometry.rs)."""

    def test_odometry_tum(self, tum_tree, capsys):
        from align3d_tpu.cli import main

        rc = main(["odometry", "tum", tum_tree, "3", "--no-bilateral", "-q"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Mean trajectory error" in out

    def test_odometry_indoor_lidar(self, il_tree, capsys):
        from align3d_tpu.cli import main

        rc = main(["odometry", "ilrgbd", il_tree, "3", "--no-bilateral", "-q"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Mean trajectory error" in out

    def test_odometry_save_trajectory_tum_format(self, il_tree, tmp_path, capsys):
        """--save-trajectory writes a TUM-format file that round-trips
        through Trajectory.from_tum_file with the estimated poses."""
        import numpy as np

        from align3d_tpu.cli import main
        from align3d_tpu.trajectory import Trajectory

        out = str(tmp_path / "traj.txt")
        rc = main(
            ["odometry", "ilrgbd", il_tree, "3", "--no-bilateral", "-q",
             "--save-trajectory", out]
        )
        assert rc == 0
        with open(out) as f:
            traj = Trajectory.from_tum(f.read())
        assert len(traj) == 3
        t = np.asarray(traj.camera_to_world.translation)
        assert np.isfinite(t).all()
        # First frame at origin (odometry convention).
        np.testing.assert_allclose(t[0], 0.0, atol=1e-6)


class TestShowAndFlythrough:
    def test_odometry_show_png(self, il_tree, tmp_path, capsys):
        from align3d_tpu.cli import main

        out = str(tmp_path / "recon.png")
        rc = main(
            ["odometry", "ilrgbd", il_tree, "3", "--no-bilateral", "-q",
             "--show", out]
        )
        assert rc == 0
        import os

        assert os.path.getsize(out) > 0

    def test_viewer_animate_gif(self, il_tree, tmp_path, capsys):
        from PIL import Image

        from align3d_tpu.cli import main

        out = str(tmp_path / "fly.gif")
        rc = main(["viewer", "ilrgbd", il_tree, "-o", out, "--max-frames", "2"])
        assert rc == 0
        img = Image.open(out)
        assert img.format == "GIF"
        assert getattr(img, "n_frames", 1) > 8  # a real animation
