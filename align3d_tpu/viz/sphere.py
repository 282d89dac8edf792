"""Bounding spheres (reference ``src/viz/sphere3d.rs``)."""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Sphere3D:
    center: np.ndarray  # (3,) f32
    radius: float

    @classmethod
    def empty(cls) -> "Sphere3D":
        return cls(np.zeros(3, np.float32), -1.0)

    @property
    def is_empty(self) -> bool:
        return self.radius < 0.0

    @classmethod
    def from_points(cls, points: np.ndarray) -> "Sphere3D":
        """Fit center = mean, radius = max distance (sphere3d.rs:14-40)."""
        pts = np.asarray(points, np.float32).reshape(-1, 3)
        if pts.shape[0] == 0:
            return cls.empty()
        center = pts.mean(axis=0)
        radius = float(np.linalg.norm(pts - center, axis=1).max())
        return cls(center, radius)

    def union(self, other: "Sphere3D") -> "Sphere3D":
        """Minimal sphere containing both (sphere3d.rs:52-93)."""
        if self.is_empty:
            return other
        if other.is_empty:
            return self
        d = float(np.linalg.norm(other.center - self.center))
        if d + other.radius <= self.radius:
            return self
        if d + self.radius <= other.radius:
            return other
        radius = (d + self.radius + other.radius) / 2.0
        direction = (other.center - self.center) / d if d > 0 else np.zeros(3)
        center = self.center + direction * (radius - self.radius)
        return Sphere3D(center.astype(np.float32), radius)

    def transformed(self, matrix: np.ndarray) -> "Sphere3D":
        """Rigid-transform the sphere (rotation preserves the radius)."""
        if self.is_empty:
            return self
        c = matrix[:3, :3] @ self.center + matrix[:3, 3]
        return Sphere3D(c.astype(np.float32), self.radius)
