"""Numpy oracle for the reference kd-tree's DESCENT-ONLY approximate NN.

Behavioral port of ``/root/reference/src/kdtree.rs``: build = median split on
the cycling axis (depth % 3) with stable ordering, leaves hold <= 16 points
(kdtree.rs:28-58); query = descend by ``point[dim] < middle_value`` with NO
backtracking, then brute-force the single landing leaf (kdtree.rs:69-105).
Used to quantify the reference search's recall so the banded-NN speedup
claim compares like-for-like approximations (round-4 verdict #7).

Implementation is vectorized over queries: one recursion partitions the
database (tree build) and routes the query set through it simultaneously —
the tree structure is query-independent, so subtrees no query reaches are
still split but cost only the sort of their own points.
"""

from __future__ import annotations

import numpy as np

LEAF_SIZE = 16  # kdtree.rs:31


def descent_nn(db: np.ndarray, queries: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Descent-only NN for every query; returns (index, squared_distance)."""
    db = np.asarray(db, np.float32)
    queries = np.asarray(queries, np.float32)
    res_idx = np.empty(queries.shape[0], np.int64)
    res_sq = np.empty(queries.shape[0], np.float32)

    # Explicit stack instead of recursion: depth ~ log2(N/16) but python
    # recursion limits are close for big clouds.
    stack = [(np.arange(db.shape[0]), np.arange(queries.shape[0]), 0)]
    while stack:
        db_idx, q_idx, depth = stack.pop()
        if q_idx.size == 0:
            continue  # tree below here is never visited by any query
        if db_idx.size <= LEAF_SIZE:
            leaf = db[db_idx]  # (L, 3)
            d = ((queries[q_idx, None, :] - leaf[None, :, :]) ** 2).sum(-1)
            a = d.argmin(axis=1)
            res_idx[q_idx] = db_idx[a]
            res_sq[q_idx] = d[np.arange(q_idx.size), a]
            continue
        k = depth % 3
        order = db_idx[np.argsort(db[db_idx, k], kind="stable")]
        mid = order.size // 2
        mid_val = db[order[mid], k]
        goes_left = queries[q_idx, k] < mid_val
        stack.append((order[:mid], q_idx[goes_left], depth + 1))
        stack.append((order[mid:], q_idx[~goes_left], depth + 1))
    return res_idx, res_sq
