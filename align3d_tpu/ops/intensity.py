"""Intensity map: bordered grayscale image with bilinear sampling + gradient.

Counterpart of the reference ``src/intensity_map.rs``. The map is a
``(H+2, W+2)`` f32 array whose 2-pixel border replicates edge values in the
exact (quirky) pattern of the reference ``fill`` (rows ``H, H+1`` replicate
row ``H-1`` for columns ``0..W-2`` only, etc. — see ``fill`` at
``src/intensity_map.rs:37-79``), so sampled values match bit-for-bit.

Sampling is fully vectorized: ``bilinear``/``bilinear_grad`` take arrays of
(u, v) coordinates and gather from the flattened map — inside the jitted ICP
step this lowers to a handful of XLA gathers fused with the surrounding math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Numeric gradient step (src/intensity_map.rs:12-14).
GRAD_H = 0.005
GRAD_H_INV = 1.0 / GRAD_H
BORDER = 2


def build_intensity_map(image_u8: Array) -> Array:
    """(H, W) u8 luma -> (H+2, W+2) f32 map with the reference border fill."""
    h, w = image_u8.shape
    core = image_u8.astype(jnp.float32) / 255.0
    m = jnp.zeros((h + BORDER, w + BORDER), jnp.float32)
    m = m.at[:h, :w].set(core)
    # Bottom border: rows h, h+1 copy row h-1, columns 0..w-2 only
    # (src/intensity_map.rs:61-66 loops `for col in 0..in_width - 1`).
    m = m.at[h : h + 2, : w - 1].set(core[h - 1, : w - 1][None, :])
    # Right border: cols w, w+1 copy col w-1, rows 0..h-2 only (:68-73).
    m = m.at[: h - 1, w : w + 2].set(core[: h - 1, w - 1][:, None])
    # Diagonal corner cells (h, w) and (h+1, w+1) get the last pixel (:75-78).
    m = m.at[h, w].set(core[h - 1, w - 1])
    m = m.at[h + 1, w + 1].set(core[h - 1, w - 1])
    return m


def _trunc_index(x: Array) -> Array:
    """Rust ``as usize`` semantics for in-range floats: truncate toward zero,
    saturating at 0 for negatives."""
    return jnp.maximum(jnp.trunc(x), 0.0).astype(jnp.int32)


def bilinear(map_padded: Array, u: Array, v: Array) -> Array:
    """Bilinear sample at float (u, v) (src/intensity_map.rs:150-169).

    ``map_padded`` is (H+2, W+2); u, v may be any broadcastable shape.
    Callers must keep trunc(u) <= W-1 and trunc(v) <= H-1 (the projective ICP
    gates guarantee this), matching the reference's unchecked indexing.
    """
    w2 = map_padded.shape[1]
    flat = map_padded.reshape(-1)
    ui = _trunc_index(u)
    vi = _trunc_index(v)
    u_frac = u - ui.astype(u.dtype)
    v_frac = v - vi.astype(v.dtype)

    base = vi * w2 + ui
    val00 = jnp.take(flat, base)
    val10 = jnp.take(flat, base + 1)
    val01 = jnp.take(flat, base + w2)
    val11 = jnp.take(flat, base + w2 + 1)

    u0 = val00 * (1.0 - u_frac) + val10 * u_frac
    u1 = val01 * (1.0 - u_frac) + val11 * u_frac
    return u0 * (1.0 - v_frac) + u1 * v_frac


def bilinear_grad(map_padded: Array, u: Array, v: Array) -> tuple[Array, Array, Array]:
    """Value + numeric (du, dv) gradients (src/intensity_map.rs:184-210).

    The gradient is the same forward difference with step H = 0.005 the
    reference uses (including its behavior when u + H crosses a cell edge).
    """
    value = bilinear(map_padded, u, v)
    uh = bilinear(map_padded, u + GRAD_H, v)
    vh = bilinear(map_padded, u, v + GRAD_H)
    return value, (uh - value) * GRAD_H_INV, (vh - value) * GRAD_H_INV
