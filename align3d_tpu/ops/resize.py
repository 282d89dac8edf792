"""Masked pyramid downsampling of range-image points/normals.

Counterpart of the reference ``src/range_image/resize.rs``: each destination
pixel looks at the 2x2 source neighborhood at ``(floor(v * ratio),
floor(u * ratio))``, takes the masked mean, and picks the source value
nearest to that mean ("nearest-to-mean" pick). Empty neighborhoods produce
mask 0 / zero values.

TPU structure: the 2x2 window of an exact half-resolution step is four
STATIC strided slices (no gathers), and the nearest-to-mean pick is a
running compare-select over the four taps — materializing a (h, w, 4, 3)
tap axis and ``argmin``/``take_along_axis``-ing over it lowered to per-pixel
gathers that dominated the whole pyramid build (45 ms of a 50 ms step for
9 frames; this form is pure VPU select chains).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _window_taps(src: Array, src_v: Array, src_u: Array) -> list[Array]:
    """The 2x2 window as a list of 4 (dst_h, dst_w, ...) arrays in
    ((0,0), (0,1), (1,0), (1,1)) offset order."""
    h, w = src.shape[0], src.shape[1]
    dh, dw = src_v.shape[0], src_u.shape[0]
    taps = []
    if h == 2 * dh and w == 2 * dw:
        # Exact 2x: reshape the pixel axes into (dh, 2, dw, 2) pairs and
        # statically index the pair slots. Stride-2 slices on the lane axis
        # are expensive relayouts on TPU (measured 11.1 ms for one batched
        # level; this form 0.12 ms — tools/probe_resize.py); the reshape is
        # layout-compatible and the pair-slot selects are contiguous.
        paired = src.reshape((dh, 2, dw, 2) + src.shape[2:])
        for dv in (0, 1):
            for du in (0, 1):
                taps.append(paired[:, dv, :, du])
    else:
        for dv in (0, 1):
            for du in (0, 1):
                vv = jnp.clip(src_v + dv, 0, h - 1)
                uu = jnp.clip(src_u + du, 0, w - 1)
                taps.append(src[vv[:, None], uu[None, :]])
    return taps


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

    vals = _window_taps(src_values.astype(jnp.float32), src_v, src_u)
    masks = _window_taps(src_mask.astype(jnp.float32), src_v, src_u)

    count = masks[0] + masks[1] + masks[2] + masks[3]
    any_valid = count > 0
    safe_count = jnp.where(any_valid, count, 1.0)
    mean = sum(v * m[..., None] for v, m in zip(vals, masks)) / safe_count[..., None]

    # Nearest-to-mean: running compare-select; strict < keeps the FIRST tap
    # on ties, matching argmin over the tap axis (and the reference's scan).
    best_val = None
    best_dist = None
    for v, m in zip(vals, masks):
        dist = jnp.sum((v - mean) ** 2, axis=-1)
        dist = jnp.where(m > 0, dist, jnp.inf)
        if best_val is None:
            best_val, best_dist = v, dist
        else:
            better = dist < best_dist
            best_dist = jnp.where(better, dist, best_dist)
            best_val = jnp.where(better[..., None], v, best_val)

    out_vals = jnp.where(any_valid[..., None], best_val, 0.0)
    return out_vals, any_valid
