"""Range images: backprojected RGB-D frames with grid structure.

Counterpart of the reference ``src/range_image/``. A :class:`RangeImage` is a
pytree of static-shaped (H, W, ...) arrays plus a validity mask — the
reference's "skip invalid pixel" iteration becomes masking, which keeps every
op jittable and batchable.

The frame-processing pipeline (:class:`RangeImageBuilder`,
reference ``src/range_image/builder.rs``) composes: optional bilateral depth
filter -> backprojection -> normals -> pyramid -> per-level intensity(+map).
Each pyramid level is one jitted function of the raw color/depth arrays.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from align3d_tpu.camera import CameraIntrinsics
from align3d_tpu.image import RgbdFrame, py_scale_down, rgb_to_luma_u8
from align3d_tpu.ops import normals as normals_ops
from align3d_tpu.ops import resize as resize_ops
from align3d_tpu.ops.intensity import build_intensity_map

Array = jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RangeImage:
    """Grid-structured point cloud (reference src/range_image/structure.rs:20-36).

    Fields mirror the reference; all arrays are (H, W, ...) with static
    shapes. ``mask`` marks valid (nonzero-depth) pixels.
    """

    points: Array  # (H, W, 3) f32, camera-frame
    mask: Array  # (H, W) bool
    intrinsics: CameraIntrinsics  # static aux data
    normals: Optional[Array] = None  # (H, W, 3) f32 unit
    colors: Optional[Array] = None  # (H, W, 3) u8
    intensities: Optional[Array] = None  # (H, W) u8
    intensity_map: Optional[Array] = None  # (H+2, W+2) f32

    # -- pytree plumbing -------------------------------------------------
    def tree_flatten(self):
        children = (
            self.points,
            self.mask,
            self.normals,
            self.colors,
            self.intensities,
            self.intensity_map,
        )
        return children, self.intrinsics

    @classmethod
    def tree_unflatten(cls, intrinsics: Any, children):
        points, mask, normals, colors, intensities, intensity_map = children
        return cls(points, mask, intrinsics, normals, colors, intensities, intensity_map)

    # -- properties ------------------------------------------------------
    @property
    def height(self) -> int:
        return self.points.shape[0]

    @property
    def width(self) -> int:
        return self.points.shape[1]

    def valid_points_count(self) -> Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    # -- construction ----------------------------------------------------
    @classmethod
    def from_rgbd(
        cls,
        intrinsics: CameraIntrinsics,
        color: Array,
        depth_u16: Array,
        depth_scale: float,
    ) -> "RangeImage":
        """Backproject depth to camera-frame points (structure.rs:56-95).

        Zero depth marks invalid pixels; their points stay (0, 0, 0).
        """
        depth_u16 = jnp.asarray(depth_u16)
        mask = depth_u16 > 0
        z = depth_u16.astype(jnp.float32) * jnp.float32(depth_scale)
        points = intrinsics.backproject_grid(z)
        points = jnp.where(mask[..., None], points, 0.0)
        return cls(points=points, mask=mask, intrinsics=intrinsics, colors=jnp.asarray(color))

    @classmethod
    def from_frame(cls, frame: RgbdFrame) -> "RangeImage":
        return cls.from_rgbd(
            frame.camera,
            jnp.asarray(frame.image.color),
            jnp.asarray(frame.image.depth),
            float(frame.image.depth_scale),
        )

    # -- derived data (return new RangeImage; arrays are immutable) ------
    def with_normals(self) -> "RangeImage":
        """Stencil normal estimation (structure.rs:184-262)."""
        return dataclasses.replace(
            self, normals=normals_ops.compute_normals(self.points, self.mask)
        )

    def with_intensity(self) -> "RangeImage":
        """RGB -> u8 luma per pixel (structure.rs:266-277)."""
        return dataclasses.replace(self, intensities=rgb_to_luma_u8(self.colors))

    def with_intensity_map(self) -> "RangeImage":
        """Bordered f32 sampling map from intensities (structure.rs:281-297)."""
        ri = self if self.intensities is not None else self.with_intensity()
        return dataclasses.replace(
            ri, intensity_map=build_intensity_map(ri.intensities)
        )

    def scale_down(self, sigma: float) -> "RangeImage":
        """Half-resolution level (structure.rs:309-340).

        Points/normals via masked nearest-to-mean; colors via Gaussian blur +
        stride 2; intrinsics scaled by 0.5. Intensity data is recomputed per
        level by the pipeline, not propagated.
        """
        dst_h, dst_w = self.height // 2, self.width // 2
        points, mask = resize_ops.resize_nearest_to_mean(
            self.points, self.mask, dst_h, dst_w
        )
        normals = None
        if self.normals is not None:
            normals, _ = resize_ops.resize_nearest_to_mean(
                self.normals, self.mask, dst_h, dst_w
            )
        colors = py_scale_down(self.colors, sigma) if self.colors is not None else None
        return RangeImage(
            points=points,
            mask=mask,
            intrinsics=self.intrinsics.scale(0.5),
            normals=normals,
            colors=colors,
        )

    def pyramid(self, levels: int, sigma: float) -> list["RangeImage"]:
        """Fine-to-coarse pyramid (structure.rs:342-351)."""
        out = [self]
        for _ in range(levels - 1):
            out.append(out[-1].scale_down(sigma))
        return out


@dataclasses.dataclass(frozen=True)
class RangeImageBuilder:
    """Frame-processing pipeline config (reference src/range_image/builder.rs).

    ``build`` runs: bilateral depth filter (optional) -> backproject ->
    normals -> pyramid -> per-level intensity + intensity map. The heavy
    per-level math is jit-compiled once per (shape, intrinsics, config).
    """

    with_normals: bool = True
    with_intensity: bool = True
    bilateral_filter: Optional[Any] = None  # BilateralFilter instance
    pyramid_levels: int = 3
    blur_sigma: float = 1.0

    def build(self, frame: RgbdFrame) -> list[RangeImage]:
        depth = jnp.asarray(frame.image.depth)
        if self.bilateral_filter is not None:
            depth = self.bilateral_filter.filter(depth)
        return _build_pyramid(
            self.with_normals,
            self.with_intensity,
            self.pyramid_levels,
            self.blur_sigma,
            frame.camera,
            float(frame.image.depth_scale),
            jnp.asarray(frame.image.color),
            depth,
        )


def build_pyramid_impl(
    with_normals: bool,
    with_intensity: bool,
    pyramid_levels: int,
    blur_sigma: float,
    intrinsics: CameraIntrinsics,
    depth_scale: float,
    color: Array,
    depth: Array,
) -> list[RangeImage]:
    """Pyramid construction (builder.rs:74-91 ordering); pure & vmappable.

    Normals are computed at full resolution then downsampled with the points;
    intensity (+map) is computed per level from that level's colors.
    """
    first = RangeImage.from_rgbd(intrinsics, color, depth, depth_scale)
    if with_normals:
        first = first.with_normals()
    levels = first.pyramid(pyramid_levels, blur_sigma)
    if with_intensity:
        levels = [ri.with_intensity().with_intensity_map() for ri in levels]
    return levels


_build_pyramid = partial(
    jax.jit,
    static_argnames=(
        "with_normals",
        "with_intensity",
        "pyramid_levels",
        "blur_sigma",
        "intrinsics",
        "depth_scale",
    ),
)(build_pyramid_impl)


def range_image_to_pointcloud(ri: RangeImage) -> dict:
    """Flatten a RangeImage into padded point-cloud arrays + mask.

    The reference filters to valid points (structure.rs:375-405); we keep
    static shapes and return the mask alongside — consumers treat masked
    entries as absent.
    """
    n = ri.height * ri.width
    out = {
        "points": ri.points.reshape(n, 3),
        "mask": ri.mask.reshape(n),
    }
    if ri.normals is not None:
        out["normals"] = ri.normals.reshape(n, 3)
    if ri.colors is not None:
        out["colors"] = ri.colors.reshape(n, 3)
    return out
