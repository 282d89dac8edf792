"""Checkpoint / resume for long odometry and pose-graph runs.

The reference has no checkpointing (SURVEY §5) — geometry export only. Here
long runs persist their state so multi-host jobs can abort + resume cleanly:

* :func:`save_state` / :func:`load_state` — atomic npz snapshot of an
  arbitrary flat pytree of arrays (trajectory poses, timestamps, frame
  cursor, pose-graph edges...).
* TUM-format trajectory interchange lives on ``Trajectory.to_tum`` /
  ``from_tum`` (align3d_tpu/trajectory.py) for external eval tools.
"""

from __future__ import annotations

import os
import tempfile

import jax
import numpy as np

from align3d_tpu.se3 import Transform
from align3d_tpu.trajectory import Trajectory


def save_state(path: str, state: dict) -> None:
    """Atomically persist a flat dict of arrays/scalars to ``path`` (npz)."""
    arrays = {k: np.asarray(v) for k, v in state.items()}
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_state(path: str) -> dict:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def save_odometry(
    path: str,
    trajectory: Trajectory,
    next_frame: int,
    fingerprint: str | None = None,
) -> None:
    """Snapshot an in-progress odometry run.

    ``fingerprint`` identifies the run configuration (dataset identity,
    engine, params); :func:`load_odometry` refuses to resume when the
    stored fingerprint does not match the one passed at load time, so two
    unrelated runs cannot be silently spliced into one trajectory.
    """
    state = {
        "rotation": trajectory.camera_to_world.rotation,
        "translation": trajectory.camera_to_world.translation,
        "times": trajectory.times,
        "next_frame": np.int64(next_frame),
    }
    if fingerprint is not None:
        state["fingerprint"] = np.array(fingerprint)
    save_state(path, state)


def load_odometry(
    path: str, fingerprint: str | None = None
) -> tuple[Trajectory, int]:
    s = load_state(path)
    if fingerprint is not None and "fingerprint" in s:
        stored = str(s["fingerprint"])
        if stored != fingerprint:
            raise ValueError(
                f"checkpoint {path!r} was written by a different run "
                f"(stored fingerprint {stored!r} != current {fingerprint!r}); "
                "refusing to resume — delete the checkpoint or point "
                "--checkpoint elsewhere"
            )
    traj = Trajectory(
        Transform(
            jax.numpy.asarray(s["rotation"]), jax.numpy.asarray(s["translation"])
        ),
        jax.numpy.asarray(s["times"]),
    )
    return traj, int(s["next_frame"])
