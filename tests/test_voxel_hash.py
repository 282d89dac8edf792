"""Voxel-hash NN vs brute-force oracle."""

import jax.numpy as jnp
import numpy as np

from align3d_tpu.ops import voxel_hash


def test_small_golden():
    # Reference kd-tree test (src/kdtree.rs:141-160).
    db = jnp.asarray([[1.0, 2, 3], [2, 3, 4], [5, 6, 7], [8, 9, 1]])
    queries = jnp.asarray([[8.0, 9.1, 1.3], [5.1, 6.4, 7.0], [1.5, 2.1, 3.3], [2.2, 3.1, 4.2]])
    grid = voxel_hash.VoxelHashGrid.build(db, cell_size=2.0)
    idx, _ = voxel_hash.nearest(grid, queries, max_per_cell=8)
    np.testing.assert_array_equal(np.asarray(idx), [3, 2, 0, 1])


def test_matches_brute_force_within_radius():
    rng = np.random.default_rng(0)
    db = jnp.asarray(rng.uniform(-2, 2, size=(5000, 3)), jnp.float32)
    queries = jnp.asarray(rng.uniform(-2, 2, size=(1000, 3)), jnp.float32)
    cell = 0.5

    grid = voxel_hash.VoxelHashGrid.build(db, cell_size=cell)
    idx, sq = voxel_hash.nearest(grid, queries, max_per_cell=64)

    # Exact f64 oracle (the matmul brute force loses precision to cancellation).
    d = np.asarray(db, np.float64)
    q = np.asarray(queries, np.float64)
    all_sq = ((q[:, None, :] - d[None, :, :]) ** 2).sum(-1)
    bf_sq = all_sq.min(axis=1)

    # Wherever the true NN is within one cell, the grid must find it
    # (up to the per-cell candidate cap; with 5000 pts in 4^3 cells of 0.5,
    # expected occupancy ~ 10 << 64).
    within = bf_sq <= cell * cell
    np.testing.assert_allclose(np.asarray(sq)[within], bf_sq[within], rtol=1e-4)

    # And the matmul brute force agrees on indices for well-separated NNs.
    bf_idx, _ = voxel_hash.nearest_brute_force(db, queries)
    agreement = (np.asarray(bf_idx) == all_sq.argmin(axis=1)).mean()
    assert agreement > 0.99, agreement


def test_shuffled_grid_exact():
    # Analog of the reference's shuffled-grid exact test (kdtree.rs:162-199).
    rng = np.random.default_rng(5)
    pts = np.arange(500 * 3, dtype=np.float32).reshape(500, 3)
    perm = rng.permutation(500)
    shuffled = pts[perm]
    grid = voxel_hash.VoxelHashGrid.build(jnp.asarray(shuffled), cell_size=10.0)
    idx, sq = voxel_hash.nearest(grid, jnp.asarray(pts), max_per_cell=16)
    # Query i's nearest must be the same coordinates (distance 0).
    np.testing.assert_allclose(np.asarray(sq), 0.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(shuffled)[np.asarray(idx)], pts)
