"""Pinhole camera model.

Counterpart of the reference's ``CameraIntrinsics``/``PinholeCamera``
(``src/camera.rs``). Intrinsics are a small frozen dataclass of Python
floats — static under ``jit`` so fx/fy/cx/cy fold into compiled kernels as
constants (each distinct camera/pyramid level compiles once, which is exactly
what we want for the 3 static pyramid levels).

All projection math is vectorized: points are ``(..., 3)`` arrays.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from align3d_tpu.se3 import Transform

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Pinhole intrinsics (reference ``src/camera.rs:7-20``)."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    def project(self, points: Array) -> tuple[Array, Array]:
        """3D points (..., 3) -> pixel (u, v) each (...,) (src/camera.rs:64)."""
        z = points[..., 2]
        u = points[..., 0] * self.fx / z + self.cx
        v = points[..., 1] * self.fy / z + self.cy
        return u, v

    def project_grad(self, points: Array) -> tuple[Array, Array, Array, Array]:
        """Projection Jacobian terms (src/camera.rs:82).

        Returns ``(du/dx, du/dz, dv/dy, dv/dz)`` — named (dfx, dcx, dfy, dcy)
        in the reference — each of shape (...,).
        """
        z = points[..., 2]
        zz = z * z
        dfx = self.fx / z
        dcx = -points[..., 0] * self.fx / zz
        dfy = self.fy / z
        dcy = -points[..., 1] * self.fy / zz
        return dfx, dcx, dfy, dcy

    def backproject(self, u: Array, v: Array, z: Array) -> Array:
        """Pixel (u, v) + depth z -> 3D point (..., 3) (src/camera.rs:102)."""
        x = (u - self.cx) * z / self.fx
        y = (v - self.cy) * z / self.fy
        return jnp.stack([x, y, jnp.broadcast_to(z, x.shape)], axis=-1)

    def backproject_grid(self, depth: Array) -> Array:
        """Backproject a full (H, W) depth image -> (H, W, 3) points."""
        h, w = depth.shape[-2:]
        vs = jnp.arange(h, dtype=depth.dtype)[:, None]
        us = jnp.arange(w, dtype=depth.dtype)[None, :]
        x = (us - self.cx) * depth / self.fx
        y = (vs - self.cy) * depth / self.fy
        return jnp.stack([x, y, depth], axis=-1)

    def scale(self, factor: float) -> "CameraIntrinsics":
        """Pyramid rescale — scales focal/center, keeps size (src/camera.rs:119)."""
        return dataclasses.replace(
            self,
            fx=self.fx * factor,
            fy=self.fy * factor,
            cx=self.cx * factor,
            cy=self.cy * factor,
        )

    def with_size(self, width: int, height: int) -> "CameraIntrinsics":
        return dataclasses.replace(self, width=width, height=height)


@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    """Intrinsics + world pose with cached inverse (src/camera.rs:137-202)."""

    intrinsics: CameraIntrinsics
    camera_to_world: Transform

    @property
    def world_to_camera(self) -> Transform:
        return self.camera_to_world.inverse()

    def project(self, points: Array) -> tuple[Array, Array, Array]:
        """World points -> (u, v, z_camera)."""
        cam_pts = self.world_to_camera.apply(points)
        u, v = self.intrinsics.project(cam_pts)
        return u, v, cam_pts[..., 2]

    def project_to_image(self, points: Array) -> tuple[Array, Array, Array, Array]:
        """Like ``project`` but also returns a visibility mask.

        The reference rounds then bound-checks (src/camera.rs:192-202); we
        return the mask instead of an Option.
        """
        u, v, z = self.project(points)
        ur, vr = jnp.round(u), jnp.round(v)
        visible = (
            (ur >= 0.0)
            & (ur < self.intrinsics.width)
            & (vr >= 0.0)
            & (vr < self.intrinsics.height)
        )
        return ur, vr, z, visible
