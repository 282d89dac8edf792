"""Checkpoint/resume round-trips (SURVEY §5 aux subsystem)."""

import jax.numpy as jnp
import numpy as np
import pytest

from align3d_tpu import checkpoint
from align3d_tpu.se3 import Transform, stack
from align3d_tpu.trajectory import Trajectory


def test_state_roundtrip(tmp_path):
    path = str(tmp_path / "state.npz")
    checkpoint.save_state(path, {"a": np.arange(5), "b": np.float32(2.5)})
    s = checkpoint.load_state(path)
    np.testing.assert_array_equal(s["a"], np.arange(5))
    assert float(s["b"]) == 2.5


def test_odometry_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    poses = [
        Transform.exp(jnp.asarray(rng.normal(0, 0.1, 6), jnp.float32))
        for _ in range(4)
    ]
    traj = Trajectory(stack(poses), jnp.arange(4, dtype=jnp.float32))
    path = str(tmp_path / "odo.npz")
    checkpoint.save_odometry(path, traj, next_frame=4)
    back, nf = checkpoint.load_odometry(path)
    assert nf == 4
    np.testing.assert_allclose(
        np.asarray(back.camera_to_world.rotation),
        np.asarray(traj.camera_to_world.rotation),
    )
    np.testing.assert_allclose(np.asarray(back.times), np.asarray(traj.times))


def test_tum_roundtrip():
    rng = np.random.default_rng(1)
    poses = [
        Transform.exp(jnp.asarray(rng.normal(0, 0.2, 6), jnp.float32))
        for _ in range(3)
    ]
    traj = Trajectory(stack(poses), jnp.asarray([0.0, 0.5, 1.0]))
    text = traj.to_tum()
    back = Trajectory.from_tum(text)
    np.testing.assert_allclose(
        np.asarray(back.camera_to_world.translation),
        np.asarray(traj.camera_to_world.translation),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(back.times), np.asarray(traj.times), atol=1e-6
    )


@pytest.mark.slow
def test_run_odometry_resume_matches_uninterrupted(sample1_dataset, tmp_path):
    """An aborted odometry run resumed from its checkpoint produces the same
    trajectory as one uninterrupted run (SURVEY §5 failure robustness; the
    CLI exposes this as --checkpoint)."""
    from align3d_tpu.odometry import run_odometry

    full = run_odometry(sample1_dataset, max_frames=5)

    ck = str(tmp_path / "odo.npz")
    # "Aborted" run: frames 1..2 only, checkpoint written at the cut.
    part = run_odometry(
        sample1_dataset, max_frames=3, checkpoint_path=ck, checkpoint_every=2
    )
    assert len(part.trajectory) == 3
    # Resume to the full length.
    resumed = run_odometry(
        sample1_dataset, max_frames=5, checkpoint_path=ck, checkpoint_every=2
    )
    assert len(resumed.trajectory) == 5
    assert len(resumed.residuals) == 2  # only the resumed frames ran
    np.testing.assert_allclose(
        np.asarray(resumed.trajectory.camera_to_world.translation),
        np.asarray(full.trajectory.camera_to_world.translation),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(resumed.trajectory.camera_to_world.rotation),
        np.asarray(full.trajectory.camera_to_world.rotation),
        atol=1e-6,
    )


def test_odometry_fingerprint_mismatch_refuses(tmp_path):
    """Resuming against a checkpoint from a different run configuration
    raises instead of silently splicing two unrelated trajectories
    (round-4 advisor finding)."""
    import pytest

    traj = Trajectory(
        stack([Transform.identity(), Transform.identity()]),
        jnp.asarray([0.0, 1.0]),
    )
    path = str(tmp_path / "odo.npz")
    checkpoint.save_odometry(path, traj, next_frame=2, fingerprint="run-a")
    # Same fingerprint resumes fine.
    back, nf = checkpoint.load_odometry(path, fingerprint="run-a")
    assert nf == 2
    # Different fingerprint refuses.
    with pytest.raises(ValueError, match="different run"):
        checkpoint.load_odometry(path, fingerprint="run-b")
    # Legacy checkpoint without a stored fingerprint still loads.
    checkpoint.save_odometry(path, traj, next_frame=2)
    checkpoint.load_odometry(path, fingerprint="run-a")


def test_run_odometry_rejects_bad_checkpoint_every(sample1_dataset):
    import pytest

    from align3d_tpu.odometry import run_odometry

    with pytest.raises(ValueError, match="checkpoint_every"):
        run_odometry(sample1_dataset, max_frames=2, checkpoint_every=0)


def test_run_odometry_resume_truncates_to_max_frames(sample1_dataset, tmp_path):
    """Resuming with a SMALLER max_frames than the checkpoint truncates the
    saved trajectory instead of breaking the metrics length match."""
    from align3d_tpu.odometry import run_odometry

    ck = str(tmp_path / "odo.npz")
    run_odometry(
        sample1_dataset, max_frames=4, checkpoint_path=ck, checkpoint_every=2
    )
    short = run_odometry(
        sample1_dataset, max_frames=2, checkpoint_path=ck, checkpoint_every=2
    )
    assert len(short.trajectory) == 2
    assert short.metrics is not None
