"""Masked pyramid downsampling of range-image points/normals.

Counterpart of the reference ``src/range_image/resize.rs``: each destination
pixel looks at the 2x2 source neighborhood at ``(floor(v * ratio),
floor(u * ratio))``, takes the masked mean, and picks the source value
nearest to that mean ("nearest-to-mean" pick). Empty neighborhoods produce
mask 0 / zero values.

Vectorized as a strided 4-tap gather + masked mean + masked argmin — one
fused XLA op per level, batchable over frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _window_gather(src: Array, src_v: Array, src_u: Array) -> Array:
    """Gather the 2x2 window: returns (dst_h, dst_w, 4, ...) stacking
    (0,0), (0,1), (1,0), (1,1) offsets."""
    h, w = src.shape[0], src.shape[1]
    taps = []
    for dv in (0, 1):
        for du in (0, 1):
            vv = jnp.clip(src_v + dv, 0, h - 1)
            uu = jnp.clip(src_u + du, 0, w - 1)
            taps.append(src[vv[:, None], uu[None, :]])
    return jnp.stack(taps, axis=2)


def resize_nearest_to_mean(
    src_values: Array, src_mask: Array, dst_height: int, dst_width: int
) -> tuple[Array, Array]:
    """(H, W, 3) values + (H, W) mask -> ((dst_h, dst_w, 3), (dst_h, dst_w) mask).

    Used for both points (resize_range_points, resize.rs:42-74) and normals
    (resize_range_normals, resize.rs:76-104 — which also keys off the point
    mask); callers discard the mask for normals.
    """
    src_h, src_w = src_values.shape[:2]
    height_ratio = src_h / dst_height
    width_ratio = src_w / dst_width
    src_v = (jnp.arange(dst_height, dtype=jnp.float32) * height_ratio).astype(jnp.int32)
    src_u = (jnp.arange(dst_width, dtype=jnp.float32) * width_ratio).astype(jnp.int32)

    vals = _window_gather(src_values.astype(jnp.float32), src_v, src_u)  # (h, w, 4, 3)
    mask = _window_gather(src_mask.astype(jnp.float32), src_v, src_u)  # (h, w, 4)

    count = jnp.sum(mask, axis=2)
    any_valid = count > 0
    safe_count = jnp.where(any_valid, count, 1.0)
    mean = jnp.sum(vals * mask[..., None], axis=2) / safe_count[..., None]

    dist = jnp.sum((vals - mean[:, :, None, :]) ** 2, axis=-1)
    dist = jnp.where(mask > 0, dist, jnp.inf)
    nearest_idx = jnp.argmin(dist, axis=2)
    nearest = jnp.take_along_axis(vals, nearest_idx[:, :, None, None], axis=2)[:, :, 0]

    out_vals = jnp.where(any_valid[..., None], nearest, 0.0)
    return out_vals, any_valid
