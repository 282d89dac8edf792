"""Mesh vertex normals — scatter-free TPU formulation.

Counterpart of the reference ``src/mesh.rs:4-52``: per-face cross-product
normals (normalized unless degenerate), averaged into vertex normals by the
number of incident faces.  The reference's scatter loop becomes
``jax.ops.segment_sum`` over the face-index axis, which XLA lowers to a
sorted segmented reduction — batchable and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def face_normals(points: Array, faces: Array) -> Array:
    """(N, 3) points, (F, 3) int faces -> (F, 3) unit face normals.

    Degenerate faces (zero-magnitude cross product) keep their zero normal,
    matching the reference's ``if mag > 0`` guard (mesh.rs:22-25).
    """
    p0 = jnp.take(points, faces[:, 0], axis=0)
    p1 = jnp.take(points, faces[:, 1], axis=0)
    p2 = jnp.take(points, faces[:, 2], axis=0)
    n = jnp.cross(p1 - p0, p2 - p0)
    mag = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return jnp.where(mag > 0.0, n / jnp.where(mag == 0.0, 1.0, mag), n)


def compute_vertex_normals(points: Array, faces: Array) -> Array:
    """(N, 3) points, (F, 3) faces -> (N, 3) vertex normals.

    Sum of incident unit face normals divided by the incident-face count —
    the exact reference average (mesh.rs:30-49), including NOT re-normalizing
    the result and producing NaN for isolated vertices (0/0), which the
    reference's integer division also yields.
    """
    n_vertices = points.shape[0]
    fn = face_normals(points, faces)
    idx = faces.reshape(-1)  # (3F,) — face-major, matching repeat order
    # One (3F, 3) scatter measured FASTER on TPU than three per-axis scalar
    # segment sums (12.5 vs 18.0 ms at 204k faces) — scatter setup dominates
    # over the trailing-dim padding here.
    contrib = jnp.repeat(fn, 3, axis=0)  # (3F, 3)
    sums = jax.ops.segment_sum(contrib, idx, num_segments=n_vertices)
    counts = jax.ops.segment_sum(
        jnp.ones_like(idx, dtype=jnp.float32), idx, num_segments=n_vertices
    )
    return sums / counts[:, None]
