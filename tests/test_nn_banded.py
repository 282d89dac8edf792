"""Banded sorted-grid NN kernel (ops/nn_banded.py) vs brute-force oracle."""

import jax.numpy as jnp
import numpy as np

from align3d_tpu.ops import voxel_hash
from align3d_tpu.ops.nn_banded import SortedGrid, nearest_banded


def _cloud(n, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(0, scale, (n, 3))).astype(np.float32)


def test_matches_brute_force_within_cell_ring():
    db = _cloud(4000, 0)
    queries = jnp.asarray(db[:2048] + _cloud(2048, 1, 0.004) - 0.002)
    cell = 0.05
    grid = SortedGrid.build(jnp.asarray(db), cell)
    idx, sq = nearest_banded(grid, queries, band_width=512)
    bidx, bsq = voxel_hash.nearest_brute_force(jnp.asarray(db), queries)
    # Perturbations are tiny vs the cell size: the banded search is exact.
    agree = float(jnp.mean((idx == bidx).astype(jnp.float32)))
    assert agree == 1.0, agree
    np.testing.assert_allclose(np.asarray(sq), np.asarray(bsq), atol=1e-6)


def test_queries_outside_grid_unmatched():
    db = _cloud(1000, 2)
    grid = SortedGrid.build(jnp.asarray(db), 0.05)
    far = jnp.asarray(np.full((130, 3), 50.0, np.float32))
    idx, sq = nearest_banded(grid, far)
    assert bool(jnp.all(jnp.isinf(sq)))


def test_ragged_query_count_and_unsort():
    """Non-multiple-of-128 Q; results must come back in caller order."""
    db = _cloud(3000, 3)
    rng = np.random.default_rng(4)
    perm = rng.permutation(999)
    queries = jnp.asarray(db[perm] + 0.001)
    grid = SortedGrid.build(jnp.asarray(db), 0.05)
    idx, sq = nearest_banded(grid, queries)
    bidx, _ = voxel_hash.nearest_brute_force(jnp.asarray(db), queries)
    assert float(jnp.mean((idx == bidx).astype(jnp.float32))) == 1.0


def test_band_truncation_is_graceful():
    """A band narrower than the data still returns valid (if farther) hits."""
    db = _cloud(5000, 5, scale=0.2)  # dense: many points per cell
    queries = jnp.asarray(db[:256])
    grid = SortedGrid.build(jnp.asarray(db), 0.05)
    idx, sq = nearest_banded(grid, queries, band_width=128)
    # Truncation may drop candidates entirely (inf) but never fabricates:
    # finite results must be genuine in-ring distances.
    sq_np = np.asarray(sq)
    finite = np.isfinite(sq_np)
    d = np.linalg.norm(db[np.asarray(idx)[finite]] - np.asarray(queries)[finite], axis=1)
    np.testing.assert_allclose(d * d, sq_np[finite], atol=1e-5)
    # With a wide-enough band and a DENSE query cloud (the ICP workload —
    # sorted blocks then span few cells) the same search is exact.
    idx2, sq2 = nearest_banded(grid, jnp.asarray(db), band_width=1024)
    np.testing.assert_allclose(np.asarray(sq2), 0.0, atol=1e-10)
