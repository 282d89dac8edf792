"""Range-image normal estimation as one fused elementwise stencil.

TPU-native version of the reference's rayon-chunked neighbor-difference
normals (``src/range_image/structure.rs:184-262``): the entire image is a
single vectorized stencil (shifted arrays + ``where`` selection), which XLA
fuses into one VPU pass — no chunking, no gather.

Semantics replicated exactly, including the quirks:
* out-of-bounds or masked-out neighbors read as the zero point;
* the distance-ratio selection (threshold 2, squared = 4) decides between
  central, backward and forward differences per axis;
* 0/0 ratios produce NaN which fails both ratio comparisons — falling through
  to the same branch as Rust's NaN comparisons;
* normals with magnitude <= 1e-6 stay zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_RATIO_THRESHOLD_SQ = 4.0  # ratio_threshold = 2 (structure.rs:188)


def _shift(valid_points: Array, dv: int, du: int) -> Array:
    """Shift (H, W, 3) so result[v, u] = valid_points[v + dv, u + du], zero-filled."""
    out = valid_points
    if dv:
        out = jnp.roll(out, -dv, axis=0)
        if dv > 0:
            out = out.at[-dv:, :].set(0.0)
        else:
            out = out.at[:-dv, :].set(0.0)
    if du:
        out = jnp.roll(out, -du, axis=1)
        if du > 0:
            out = out.at[:, -du:].set(0.0)
        else:
            out = out.at[:, :-du].set(0.0)
    return out


def _axis_difference(center: Array, backward: Array, forward: Array) -> Array:
    """The reference's per-axis difference selection (structure.rs:215-248).

    backward/forward are the (-) and (+) neighbors (left/right or top/bottom
    in the reference's naming: note its "bottom" is row+1 = our forward is
    `bottom`, backward is `top` for the vertical axis — see caller).
    """
    b_dist = jnp.sum((backward - center) ** 2, axis=-1, keepdims=True)
    f_dist = jnp.sum((forward - center) ** 2, axis=-1, keepdims=True)
    ratio = b_dist / f_dist
    central = (ratio < _RATIO_THRESHOLD_SQ) & (ratio > 1.0 / _RATIO_THRESHOLD_SQ)
    return jnp.where(
        central,
        forward - backward,
        jnp.where(b_dist < f_dist, center - backward, forward - center),
    )


def compute_normals(points: Array, mask: Array) -> Array:
    """(H, W, 3) points + (H, W) validity mask -> (H, W, 3) unit normals.

    Cross product of the horizontal and vertical selected differences,
    normalized; zero where degenerate. Matches
    ``RangeImage::compute_normals`` output bit-for-bit up to f32 fusion
    reassociation.
    """
    points = points.astype(jnp.float32)
    valid = points * mask.astype(jnp.float32)[..., None]

    left = _shift(valid, 0, -1)
    right = _shift(valid, 0, 1)
    top = _shift(valid, -1, 0)
    bottom = _shift(valid, 1, 0)

    # Reference: center is the raw (unmasked) point value; invalid centers are
    # zero anyway because backprojection only writes valid pixels.
    center = points

    # Horizontal: ratio = left/right distances; central diff = right - left.
    left_to_right = _axis_difference(center, left, right)
    # Vertical: the reference computes bottom/top ratio with bottom = row+1;
    # central diff = top - bottom (structure.rs:229-248).
    bottom_to_top = _axis_difference(center, bottom, top)

    normal = jnp.cross(left_to_right, bottom_to_top)
    mag = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    return jnp.where(mag > 1e-6, normal / jnp.where(mag > 1e-6, mag, 1.0), 0.0)
