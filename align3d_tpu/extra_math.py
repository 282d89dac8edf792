"""Small math helpers (reference ``src/extra_math.rs``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def angle_between_normals(lfs: Array, rfs: Array) -> Array:
    """Angle between two (batches of) unit normals, radians.

    Reference ``src/extra_math.rs:13``: ``lfs.dot(rfs).acos().abs()`` — note
    the reference does NOT clamp the dot product, so values outside [-1, 1]
    (f32 rounding on unit vectors) produce NaN there; we match by not
    clamping either. Batched over leading dims.
    """
    return jnp.abs(jnp.arccos(jnp.sum(lfs * rfs, axis=-1)))
