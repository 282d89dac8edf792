"""Preconditioned conjugate gradient with a jit-static trip count.

Shared by the distributed pose-graph and bundle-adjustment solvers
(align3d_tpu/parallel/{pose_graph,bundle_adjustment}.py): block-Jacobi (or
any caller-supplied) preconditioner, fixed ``iters`` trips for XLA, frozen
via masking once the preconditioned residual norm passes ``tol`` — every
quantity in the loop is shard_map-safe (the callers psum inside ``matvec``).
No counterpart in the reference, which has no global refinement at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pcg(matvec, precond, b, iters: int, tol: float = 1e-10):
    """Solve ``matvec(x) = b``; returns x after ``iters`` masked CG trips."""
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)

    def body(_, carry):
        x, r, p, rz = carry
        hp = matvec(p)
        denom = jnp.sum(p * hp)
        live = (rz > tol) & (denom > 0.0)
        alpha = jnp.where(live, rz / jnp.where(denom == 0.0, 1.0, denom), 0.0)
        x = x + alpha * p
        r = r - alpha * hp
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(live, rz_new / jnp.where(rz == 0.0, 1.0, rz), 0.0)
        p = jnp.where(live, z + beta * p, p)
        return x, r, p, jnp.where(live, rz_new, rz)

    x, *_ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x
