"""Bilateral-grid depth filter (Chen/Paris/Durand real-time bilateral grid).

Counterpart of the reference ``src/bilateral/`` (grid.rs + edge_aware_filter.rs,
which cite the same paper). The TPU decomposition:

* **splat** — scatter-add of (value, count) into the (gh, gw, gd) grid; the
  grid is ~1000x smaller than the image, so the scatter is cheap relative to
  the surrounding dense math;
* **blur** — 3 axes x 2 passes of a 1-2-1/4 kernel as fused shifts
  (edge_aware_filter.rs:57-115 does the same with raw pointers; its
  interior-only writes are reproduced with an interior mask — border cells
  and the last depth channel stay zero exactly as the pointer walk leaves
  them);
* **normalize + slice** — per-pixel trilinear gather (grid.rs:90-162).

The grid's depth extent is data-dependent in the reference
(``(max - min)/sigma_color``, grid.rs:51-54); for stable jit caching the
depth axis can be padded up to a multiple (``pad_depth_to``) — padded
channels stay empty and are never sampled, so results are unchanged.

Like the reference, slicing evaluates EVERY pixel (including zero-depth
holes), so the filter also fills holes near valid data — this grows the
valid-pixel mask downstream, matching reference behavior.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

_SPACE_PAD = 2
_COLOR_PAD = 2


@partial(jax.jit, static_argnames=("grid_shape", "sigma_space", "sigma_color"))
def _splat(
    image: Array,
    color_min: Array,
    grid_shape: tuple[int, int, int],
    sigma_space: float,
    sigma_color: float,
) -> Array:
    """Scatter depth values+counts into the grid (grid.rs:59-77)."""
    gh, gw, gd = grid_shape
    h, w = image.shape
    inv_ss = 1.0 / sigma_space
    inv_sc = 1.0 / sigma_color

    rows = (jnp.arange(h, dtype=jnp.float32) * inv_ss + 0.5).astype(jnp.int32) + _SPACE_PAD
    cols = (jnp.arange(w, dtype=jnp.float32) * inv_ss + 0.5).astype(jnp.int32) + _SPACE_PAD
    vals = image.astype(jnp.float32)
    chan = ((vals - color_min.astype(jnp.float32)) * inv_sc + 0.5).astype(
        jnp.int32
    ) + _COLOR_PAD

    # Reference skips color <= I::min_value() (zero depth).
    valid = image > 0
    lin = (rows[:, None] * gw + cols[None, :]) * gd + chan
    lin = jnp.where(valid, lin, gh * gw * gd)  # dump lane for invalid

    flat_val = jnp.zeros(gh * gw * gd + 1, jnp.float32).at[lin.reshape(-1)].add(
        jnp.where(valid, vals, 0.0).reshape(-1)
    )
    flat_cnt = jnp.zeros(gh * gw * gd + 1, jnp.float32).at[lin.reshape(-1)].add(
        valid.astype(jnp.float32).reshape(-1)
    )
    return jnp.stack(
        [flat_val[:-1].reshape(gh, gw, gd), flat_cnt[:-1].reshape(gh, gw, gd)], axis=-1
    )


def _shift_axis(x: Array, shift: int, axis: int) -> Array:
    """Zero-filled shift along axis: result[i] = x[i + shift]."""
    rolled = jnp.roll(x, -shift, axis=axis)
    n = x.shape[axis]
    idx = jnp.arange(n) + shift
    ok = (idx >= 0) & (idx < n)
    shape = [1] * x.ndim
    shape[axis] = n
    return rolled * ok.reshape(shape).astype(x.dtype)


@jax.jit
def _blur(grid: Array) -> Array:
    """3-axis x 2-pass 1-2-1/4 blur with reference interior-only writes."""
    gh, gw, gd = grid.shape[:3]
    interior = (
        ((jnp.arange(gh) > 0) & (jnp.arange(gh) < gh - 1)).reshape(gh, 1, 1, 1)
        & ((jnp.arange(gw) > 0) & (jnp.arange(gw) < gw - 1)).reshape(1, gw, 1, 1)
        & (jnp.arange(gd) < gd - 1).reshape(1, 1, gd, 1)
    ).astype(grid.dtype)

    out = grid
    for axis in (0, 1, 2):
        for _ in range(2):
            blurred = 0.25 * (
                _shift_axis(out, -1, axis) + 2.0 * out + _shift_axis(out, 1, axis)
            )
            out = blurred * interior
    return out


@jax.jit
def _normalize(grid: Array) -> Array:
    """value /= count, count -> 1 where count > 0 (grid.rs:90-104)."""
    val, cnt = grid[..., 0], grid[..., 1]
    has = cnt > 0
    val = jnp.where(has, val / jnp.where(has, cnt, 1.0), val)
    cnt = jnp.where(has, 1.0, cnt)
    return jnp.stack([val, cnt], axis=-1)


@partial(jax.jit, static_argnames=("sigma_space", "sigma_color"))
def _slice(
    grid: Array,
    image: Array,
    color_min: Array,
    sigma_space: float,
    sigma_color: float,
) -> Array:
    """Per-pixel trilinear sample of the value channel (grid.rs:106-162).

    TPU structure: the spatial (y, x) corner indices depend ONLY on the
    pixel coordinate — they are numpy constants, so the 4 spatial corner
    planes are static gathers (compiled copies, not runtime gathers). Only
    the range (z) coordinate is data-dependent; it resolves as a weighted
    reduction over the z axis, which XLA fuses — no per-pixel random
    gathers at all (8 ``take``s cost ~17 ms/frame on TPU; this form ~1 ms).
    """
    import numpy as np

    gh, gw, gd = grid.shape[:3]
    h, w = image.shape
    inv_ss = 1.0 / sigma_space
    inv_sc = 1.0 / sigma_color

    def np_axis_indices(coord, n):
        i0 = np.clip(coord.astype(np.int32), 0, n - 1)
        i1 = np.clip((coord + 1.0).astype(np.int32), 0, n - 1)
        alpha = (coord - i0).astype(np.float32)
        return i0, i1, alpha

    rowf = np.arange(h, dtype=np.float32) * np.float32(inv_ss) + _SPACE_PAD
    colf = np.arange(w, dtype=np.float32) * np.float32(inv_ss) + _SPACE_PAD
    y0, y1, ya = np_axis_indices(rowf, gh)  # (h,) numpy constants
    x0, x1, xa = np_axis_indices(colf, gw)  # (w,)

    chan = (
        image.astype(jnp.float32) - color_min.astype(jnp.float32)
    ) * inv_sc + _COLOR_PAD
    z0 = jnp.clip(chan.astype(jnp.int32), 0, gd - 1)
    z1 = jnp.clip((chan + 1.0).astype(jnp.int32), 0, gd - 1)
    za = chan - z0.astype(jnp.float32)

    # Per-pixel z weights, reduced against each spatial corner plane.
    kk = jnp.arange(gd, dtype=jnp.int32)
    wz = jnp.where(kk == z0[..., None], (1.0 - za)[..., None], 0.0) + jnp.where(
        kk == z1[..., None], za[..., None], 0.0
    )  # (h, w, gd)

    val = grid[..., 0]
    value = jnp.zeros((h, w), jnp.float32)
    for yi, wy in ((y0, 1.0 - ya), (y1, ya)):
        for xi, wx in ((x0, 1.0 - xa), (x1, xa)):
            plane = val[yi][:, xi]  # (h, w, gd) — static-index copies
            wyx = jnp.asarray(np.outer(wy, wx), jnp.float32)  # constant
            value = value + wyx * jnp.einsum(
                "hwk,hwk->hw", plane, wz, preferred_element_type=jnp.float32
            )
    return value


@dataclasses.dataclass
class BilateralGrid:
    """Built grid + metadata (mirrors reference ``BilateralGrid``)."""

    data: Array  # (gh, gw, gd, 2) f32
    sigma_space: float
    sigma_color: float
    color_min: Array  # scalar, original dtype

    @classmethod
    def from_image(
        cls,
        image: Array,
        sigma_space: float,
        sigma_color: float,
        pad_depth_to: int = 1,
    ) -> "BilateralGrid":
        image = jnp.asarray(image)
        h, w = image.shape
        gh = int((h - 1) / sigma_space) + 1 + 2 * _SPACE_PAD
        gw = int((w - 1) / sigma_space) + 1 + 2 * _COLOR_PAD
        color_min = jnp.min(image)
        color_max = jnp.max(image)
        diff = float(color_max) - float(color_min)  # host sync, sizes the grid
        gd = int(diff / sigma_color) + 1 + 2 * _COLOR_PAD
        if pad_depth_to > 1:
            gd = -(-gd // pad_depth_to) * pad_depth_to
        data = _splat(image, color_min, (gh, gw, gd), sigma_space, sigma_color)
        return cls(data, sigma_space, sigma_color, color_min)

    @classmethod
    def from_image_static(
        cls,
        image: Array,
        color_min: Array,
        grid_depth: int,
        sigma_space: float,
        sigma_color: float,
    ) -> "BilateralGrid":
        """Jit-safe grid build with a CALLER-FIXED depth-axis size.

        The reference sizes the range axis from the image's min/max depth
        (grid.rs:51-54) — a data-dependent shape, which :meth:`from_image`
        reproduces with a host sync. Under ``jit`` shapes must be static
        (SURVEY §7 hard part 2), so here the caller supplies ``grid_depth``
        (≥ (max−min)/σc + 1 + 2·pad for exact parity; values above the true
        range only waste memory, never change the result) and a traced
        ``color_min``.
        """
        image = jnp.asarray(image)
        h, w = image.shape
        gh = int((h - 1) / sigma_space) + 1 + 2 * _SPACE_PAD
        gw = int((w - 1) / sigma_space) + 1 + 2 * _COLOR_PAD
        data = _splat(
            image, color_min, (gh, gw, int(grid_depth)), sigma_space, sigma_color
        )
        return cls(data, sigma_space, sigma_color, color_min)

    @property
    def dim(self) -> tuple[int, int, int, int]:
        return tuple(self.data.shape)

    def convolve(self) -> "BilateralGrid":
        return dataclasses.replace(self, data=_blur(self.data))

    def normalize(self) -> "BilateralGrid":
        return dataclasses.replace(self, data=_normalize(self.data))

    def slice(self, image: Array) -> Array:
        """Sample back to image space; returns the image's dtype (truncating
        cast, like the reference's ``num::cast``)."""
        image = jnp.asarray(image)
        value = _slice(
            self.data, image, self.color_min, self.sigma_space, self.sigma_color
        )
        return value.astype(image.dtype)


@dataclasses.dataclass(frozen=True)
class BilateralFilter:
    """Depth filter front-end (reference edge_aware_filter.rs:12-56 defaults)."""

    sigma_space: float = 4.50000000225
    sigma_color: float = 29.9999880000072
    # jit-cache friendliness: depth-axis quantum for the data-dependent grid.
    pad_depth_to: int = 16

    def filter(self, image: Array) -> Array:
        grid = BilateralGrid.from_image(
            image, self.sigma_space, self.sigma_color, self.pad_depth_to
        )
        return grid.convolve().normalize().slice(image)

    def filter_static(self, image: Array, color_min: Array, grid_depth: int) -> Array:
        """Jit-safe :meth:`filter` with caller-fixed grid depth (see
        :meth:`BilateralGrid.from_image_static`)."""
        grid = BilateralGrid.from_image_static(
            image, color_min, grid_depth, self.sigma_space, self.sigma_color
        )
        return grid.convolve().normalize().slice(image)

    def scale_down(self, image: Array) -> Array:
        """Filter then stride-2 decimate (edge_aware_filter.rs:137-147)."""
        from align3d_tpu.image import _decimate2

        filtered = self.filter(image)
        h, w = filtered.shape
        return _decimate2(filtered, h // 2, w // 2)
