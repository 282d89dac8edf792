"""SE(3) log + distributed pose-graph optimization tests (SURVEY phase 5)."""

import pytest
import jax.numpy as jnp
import numpy as np

from align3d_tpu.parallel import pose_graph as pg
from align3d_tpu.parallel.batch import make_mesh
from align3d_tpu.se3 import Transform
from align3d_tpu.trajectory import Trajectory


def test_log_inverts_exp():
    rng = np.random.default_rng(0)
    twists = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-0.5, 0.5, (16, 3)),
                rng.uniform(-0.8, 0.8, (16, 3)),
            ],
            axis=1,
        ),
        jnp.float32,
    )
    t = Transform.exp(twists)
    back = t.log()
    np.testing.assert_allclose(np.asarray(back), np.asarray(twists), atol=2e-5)


def test_log_small_angle():
    twist = jnp.asarray([0.01, -0.02, 0.03, 1e-7, -1e-7, 1e-8], jnp.float32)
    t = Transform.exp(twist)
    np.testing.assert_allclose(np.asarray(t.log()), np.asarray(twist), atol=1e-6)


def _noisy_ring(n=12, seed=0):
    """Ground-truth poses on a circle; odometry measurements with noise and
    a perfect loop-closure measurement n-1 -> 0."""
    rng = np.random.default_rng(seed)
    gt = []
    for k in range(n):
        angle = 2 * np.pi * k / n
        twist = np.array([np.cos(angle), np.sin(angle), 0, 0, 0, angle], np.float32)
        gt.append(Transform.exp(jnp.asarray(twist)))
    from align3d_tpu.se3 import stack

    gt_batch = stack(gt)

    # Odometry: relative poses with noise -> accumulated drifting estimate.
    noisy_rel = []
    for k in range(n - 1):
        rel = gt[k].inverse() @ gt[k + 1]
        noise = Transform.exp(jnp.asarray(rng.normal(0, 0.02, 6), jnp.float32))
        noisy_rel.append(rel @ noise)
    est = [gt[0]]
    for k in range(n - 1):
        est.append(est[-1] @ noisy_rel[k])
    est_batch = stack(est)
    traj = Trajectory(est_batch, jnp.arange(n, dtype=jnp.float32))
    return gt_batch, traj, gt, noisy_rel


def _pose_err(a: Transform, b: Transform) -> float:
    d = a.inverse() @ b
    return float(jnp.max(jnp.linalg.norm(d.log(), axis=-1)))


def test_pose_graph_reduces_drift():
    gt, traj, gt_list, _ = _noisy_ring()
    n = len(gt_list)
    # Loop closure: exact relative pose between last and first frames.
    z = gt_list[0].inverse() @ gt_list[n - 1]
    refined = pg.refine_trajectory(
        traj, loop_edges=[(0, n - 1, z, 10.0)], iterations=10
    )
    err_before = _pose_err(traj.camera_to_world, gt)
    err_after = _pose_err(refined.camera_to_world, gt)
    assert err_after < err_before  # global refinement helps
    # The loop-closure endpoints now agree with the measurement.
    d = (
        refined.camera_to_world[0].inverse() @ refined.camera_to_world[n - 1]
    ).inverse() @ z
    assert float(jnp.linalg.norm(d.log())) < 0.02


def test_sharded_matches_single_device():
    gt, traj, gt_list, _ = _noisy_ring(n=9)
    z = gt_list[0].inverse() @ gt_list[8]
    single = pg.refine_trajectory(traj, loop_edges=[(0, 8, z, 5.0)], iterations=5)
    mesh = make_mesh()  # 8 virtual CPU devices; edge count 9 pads to 16
    sharded = pg.refine_trajectory(
        traj, loop_edges=[(0, 8, z, 5.0)], iterations=5, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(sharded.camera_to_world.rotation),
        np.asarray(single.camera_to_world.rotation),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.camera_to_world.translation),
        np.asarray(single.camera_to_world.translation),
        atol=1e-4,
    )


def test_propose_loop_closures():
    gt, traj, _, _ = _noisy_ring(n=12)
    # On a ring, frame 11 returns near frame 0.
    cands = pg.propose_loop_closures(traj, min_separation=6, max_translation=1.5)
    assert cands.shape[1] == 2
    assert len(cands) > 0


def _dense_propose(traj, min_separation, max_translation, max_candidates):
    """The r2/r3 dense (N, N) reference form, kept as the test oracle."""
    t = np.asarray(traj.camera_to_world.translation)
    n = t.shape[0]
    d = np.linalg.norm(t[:, None, :] - t[None, :, :], axis=-1)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ok = (jj > ii + min_separation) & (d < max_translation)
    ci, cj = np.nonzero(ok)
    order = np.argsort(d[ci, cj], kind="stable")[:max_candidates]
    return np.stack([ci[order], cj[order]], axis=1).astype(np.int64)


def test_propose_chunked_matches_dense():
    """The O(N*chunk)-memory chunked scan returns the dense scan's ranked
    output bit-for-bit, including distance ties (tiny row_chunk forces many
    chunks; duplicated poses force cross-chunk ties)."""
    rng = np.random.default_rng(3)
    n = 400
    t = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    t[37] = t[350]  # exact revisit -> distance-0 tie
    t[38] = t[351]
    poses = Transform(
        jnp.broadcast_to(jnp.eye(3), (n, 3, 3)), jnp.asarray(t)
    )
    traj = Trajectory(poses, jnp.arange(n, dtype=jnp.float32))
    for k in (8, 32):
        dense = _dense_propose(traj, 10, 0.6, k)
        chunked = pg.propose_loop_closures(
            traj, min_separation=10, max_translation=0.6,
            max_candidates=k, row_chunk=23,
        )
        np.testing.assert_array_equal(chunked, dense)


def test_propose_scales_without_dense_matrix():
    """10k poses: the proposal runs in O(N*chunk) memory (a dense f64
    (N, N) would be 800 MB) and still returns the ranked nearest pairs."""
    rng = np.random.default_rng(5)
    n = 10_000
    # Random walk that revisits the origin at the end.
    steps = rng.normal(0, 0.05, (n, 3))
    t = np.cumsum(steps, axis=0).astype(np.float32)
    t[-1] = t[0] + 1e-4
    poses = Transform(jnp.broadcast_to(jnp.eye(3), (n, 3, 3)), jnp.asarray(t))
    traj = Trajectory(poses, jnp.arange(n, dtype=jnp.float32))
    cands = pg.propose_loop_closures(
        traj, min_separation=100, max_translation=0.05, max_candidates=16
    )
    assert len(cands) == 16
    # The engineered revisit is the closest pair.
    assert tuple(cands[0]) == (0, n - 1)


def test_cg_matches_dense():
    """Block-COO + block-Jacobi PCG == the dense Cholesky path (small graph,
    both solvers forced)."""
    gt, traj, gt_list, _ = _noisy_ring(n=10)
    z = gt_list[0].inverse() @ gt_list[9]
    graph = pg.PoseGraph.from_trajectory(traj).with_edge(0, 9, z, 5.0)
    dense = pg.optimize(graph, iterations=6, solver="dense")
    cg = pg.optimize(graph, iterations=6, solver="cg", cg_iters=128)
    np.testing.assert_allclose(
        np.asarray(cg.translation), np.asarray(dense.translation), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(cg.rotation), np.asarray(dense.rotation), atol=2e-4
    )


def test_cg_sharded_matches_single():
    gt, traj, gt_list, _ = _noisy_ring(n=9)
    z = gt_list[0].inverse() @ gt_list[8]
    graph = pg.PoseGraph.from_trajectory(traj).with_edge(0, 8, z, 5.0)
    single = pg.optimize(graph, iterations=4, solver="cg")
    mesh = make_mesh()
    sharded = pg.optimize(graph, iterations=4, solver="cg", mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(sharded.translation), np.asarray(single.translation), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sharded.rotation), np.asarray(single.rotation), atol=1e-4
    )


@pytest.mark.slow
def test_cg_long_sequence_scales():
    """500-pose chain + loop closures: the CG path runs where the dense
    assembly (O(E*N^2) one-hot einsums) would build 9e9-element temporaries.
    Checks drift reduction, not just survival."""
    n = 500
    rng = np.random.default_rng(3)
    from align3d_tpu.se3 import stack

    gt = [Transform.identity()]
    for k in range(n - 1):
        step = Transform.exp(
            jnp.asarray([0.1, 0.0, 0.0, 0.0, 0.0, 2 * np.pi / n], jnp.float32)
        )
        gt.append(gt[-1] @ step)
    est = [gt[0]]
    for k in range(n - 1):
        rel = gt[k].inverse() @ gt[k + 1]
        noise = Transform.exp(jnp.asarray(rng.normal(0, 0.01, 6), jnp.float32))
        est.append(est[-1] @ (rel @ noise))
    traj = Trajectory(stack(est), jnp.arange(n, dtype=jnp.float32))
    graph = pg.PoseGraph.from_trajectory(traj)
    for j in (n // 2, n - 1):
        z = gt[0].inverse() @ gt[j]
        graph = graph.with_edge(0, j, z, 10.0)

    # CG information travels one graph hop per matvec, so a 500-chain
    # needs ~N iterations; each matvec is O(E) so this stays cheap.
    refined = pg.optimize(graph, iterations=4, solver="auto", cg_iters=768)
    gt_batch = stack(gt)
    err_before = _pose_err(traj.camera_to_world, gt_batch)
    err_after = _pose_err(refined, gt_batch)
    assert err_after < 0.6 * err_before
