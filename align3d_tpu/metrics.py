"""Trajectory/transform error metrics.

Counterpart of the reference ``src/metrics.rs`` (mean trajectory error =
elementwise mean of angle/translation of ``lhs^-1 @ rhs``), extended with the
standard ATE-RMSE and RPE metrics the reference lacks (SURVEY.md §5).
All pairwise metrics are batched array ops (vmapped pose diffs).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from align3d_tpu.se3 import Transform
from align3d_tpu.trajectory import Trajectory

Array = jax.Array


@dataclasses.dataclass
class TransformMetrics:
    """Angle (radians) + translation-norm difference of two transforms."""

    angle: Array
    translation: Array

    @classmethod
    def new(cls, lhs: Transform, rhs: Transform) -> "TransformMetrics":
        """Reference src/metrics.rs:23-31: metrics of ``lhs^-1 @ rhs``."""
        diff = lhs.inverse() @ rhs
        return cls(angle=diff.angle(), translation=jnp.linalg.norm(diff.translation, axis=-1))

    @classmethod
    def mean_trajectory_error(
        cls, pred: Trajectory, gt: Trajectory
    ) -> "TransformMetrics":
        """Elementwise mean over aligned trajectories (src/metrics.rs:33-52)."""
        if len(pred) != len(gt):
            raise ValueError("Pred and GT trajectories have different lengths.")
        m = cls.new(pred.camera_to_world, gt.camera_to_world)
        return cls(angle=jnp.mean(m.angle), translation=jnp.mean(m.translation))

    def total(self) -> Array:
        return self.angle + self.translation

    def __str__(self) -> str:
        return (
            f"angle: {float(jnp.rad2deg(self.angle)):.2f}°, "
            f"translation: {float(self.translation):.5f}"
        )


def ate_rmse(pred: Trajectory, gt: Trajectory) -> tuple[Array, Array]:
    """Absolute trajectory error RMSE (rotation rad, translation) — no alignment."""
    diff = pred.camera_to_world.inverse() @ gt.camera_to_world
    rot_err = diff.angle()
    t_err = jnp.linalg.norm(diff.translation, axis=-1)
    return jnp.sqrt(jnp.mean(rot_err**2)), jnp.sqrt(jnp.mean(t_err**2))


def rpe(pred: Trajectory, gt: Trajectory, delta: int = 1) -> tuple[Array, Array]:
    """Relative pose error over frame offset ``delta`` (RMSE rot/trans)."""
    n = len(pred)
    if n <= delta:
        raise ValueError("trajectory too short for requested delta")
    p = pred.camera_to_world
    g = gt.camera_to_world
    p_rel = p[: n - delta].inverse() @ p[delta:]
    g_rel = g[: n - delta].inverse() @ g[delta:]
    diff = p_rel.inverse() @ g_rel
    rot_err = diff.angle()
    t_err = jnp.linalg.norm(diff.translation, axis=-1)
    return jnp.sqrt(jnp.mean(rot_err**2)), jnp.sqrt(jnp.mean(t_err**2))
