"""Schur-complement bundle adjustment (align3d_tpu/parallel/bundle_adjustment.py).

Synthetic RGB-D scene recovery + Schur-vs-dense algebra + sharded-vs-single
parity on the virtual 8-device CPU mesh (SURVEY §4.5 distributed strategy).
Observations are (u, v, z) — pixel + measured depth, the RGB-D case; depth
pins the global-scale gauge that reprojection-only BA leaves free.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from align3d_tpu.camera import CameraIntrinsics
from align3d_tpu.parallel import bundle_adjustment as ba
from align3d_tpu.se3 import Transform

INTR = CameraIntrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)


def _synthetic_problem(
    n_poses=6, n_landmarks=40, seed=0, pose_noise=0.02, lm_noise=0.05, px_noise=0.0
):
    """Landmark cloud in front of a small camera arc; every landmark observed
    by every pose (dense visibility keeps the test deterministic)."""
    rng = np.random.default_rng(seed)
    landmarks_gt = np.concatenate(
        [
            rng.uniform(-1.0, 1.0, (n_landmarks, 2)),
            rng.uniform(2.0, 4.0, (n_landmarks, 1)),
        ],
        axis=1,
    ).astype(np.float32)

    twists = rng.normal(0.0, 0.03, (n_poses, 6)).astype(np.float32)
    twists[:, :3] *= 2.0  # translations up to a few cm
    twists[0] = 0.0
    poses_gt = Transform.exp(jnp.asarray(twists))

    obs_pose, obs_landmark, obs_uv, obs_z = [], [], [], []
    for i in range(n_poses):
        t_wc = poses_gt[i].inverse()
        p_cam = np.asarray(t_wc.apply(jnp.asarray(landmarks_gt)))
        u = p_cam[:, 0] * INTR.fx / p_cam[:, 2] + INTR.cx
        v = p_cam[:, 1] * INTR.fy / p_cam[:, 2] + INTR.cy
        for j in range(n_landmarks):
            obs_pose.append(i)
            obs_landmark.append(j)
            obs_uv.append((u[j], v[j]))
            obs_z.append(p_cam[j, 2])
    obs_uv = np.asarray(obs_uv, np.float32)
    obs_z = np.asarray(obs_z, np.float32)
    if px_noise:
        obs_uv = obs_uv + rng.normal(0.0, px_noise, obs_uv.shape).astype(np.float32)
        obs_z = obs_z + rng.normal(0.0, px_noise / INTR.fx, obs_z.shape).astype(
            np.float32
        )

    # Perturb the initial estimate away from GT (pose 0 stays the gauge).
    noise = rng.normal(0.0, pose_noise, (n_poses, 6)).astype(np.float32)
    noise[0] = 0.0
    poses0 = poses_gt @ Transform.exp(jnp.asarray(noise))
    landmarks0 = landmarks_gt + rng.normal(0.0, lm_noise, landmarks_gt.shape).astype(
        np.float32
    )

    problem = ba.BAProblem(
        poses=poses0,
        landmarks=jnp.asarray(landmarks0),
        obs_pose=jnp.asarray(obs_pose, jnp.int32),
        obs_landmark=jnp.asarray(obs_landmark, jnp.int32),
        obs_uv=jnp.asarray(obs_uv),
        weights=jnp.ones(len(obs_pose), jnp.float32),
        intrinsics=INTR,
        obs_z=jnp.asarray(obs_z),
    )
    return problem, poses_gt, jnp.asarray(landmarks_gt)


def test_recovers_synthetic_scene():
    problem, poses_gt, landmarks_gt = _synthetic_problem()
    err0 = float(ba.mean_reprojection_error(problem))
    poses, landmarks = ba.optimize(problem, iterations=8)
    refined = ba.BAProblem(
        poses, landmarks, problem.obs_pose, problem.obs_landmark,
        problem.obs_uv, problem.weights, INTR, obs_z=problem.obs_z,
    )
    err = float(ba.mean_reprojection_error(refined))
    assert err0 > 1.0  # the perturbation was visible
    assert err < 1e-2  # noise-free observations -> near-exact recovery

    # Gauge: pose 0 must not move; the rest must match GT.
    d0 = (problem.poses[0].inverse() @ poses[0]).log()
    np.testing.assert_allclose(np.asarray(d0), 0.0, atol=1e-6)
    rel = poses_gt.inverse() @ poses
    assert float(jnp.max(jnp.linalg.norm(rel.log(), axis=-1))) < 1e-3
    assert float(jnp.max(jnp.linalg.norm(landmarks - landmarks_gt, axis=-1))) < 1e-3


def test_schur_matches_dense_solve():
    """The Schur-reduced update equals the full joint (6N+3M) dense solve."""
    problem, _, _ = _synthetic_problem(n_poses=3, n_landmarks=8, seed=3)
    n, m = problem.n_poses, problem.n_landmarks
    obs_uvz = jnp.concatenate([problem.obs_uv, problem.obs_z[:, None]], axis=1)
    hpp, hll, w_obs, gp, gl, _, _ = ba._partials(
        problem.poses, problem.landmarks, problem.obs_pose,
        problem.obs_landmark, obs_uvz, problem.weights, INTR, n, m,
        with_depth=True, depth_weight=problem.depth_weight,
    )
    w_blk = ba._densify_w(w_obs, problem.obs_pose, problem.obs_landmark, n, m)
    damping = 1e-4
    dp, dl = ba._schur_solve(hpp, hll, w_blk, gp, gl, damping)

    # Dense assembly of the same gauge-fixed damped system (gauge applied
    # identically: pose-0 rows/cols zeroed incl. its W blocks, I diagonal).
    size = n * 6 + m * 3
    h = np.zeros((size, size), np.float64)
    g = np.zeros(size, np.float64)
    for i in range(n):
        h[i * 6 : i * 6 + 6, i * 6 : i * 6 + 6] = np.asarray(hpp[i])
        g[i * 6 : i * 6 + 6] = np.asarray(gp[i])
    for j in range(m):
        o = n * 6 + j * 3
        h[o : o + 3, o : o + 3] = np.asarray(hll[j])
        g[o : o + 3] = np.asarray(gl[j])
    wb = np.asarray(w_blk)
    for i in range(n):
        for j in range(m):
            h[i * 6 : i * 6 + 6, n * 6 + j * 3 : n * 6 + j * 3 + 3] = wb[i, j]
            h[n * 6 + j * 3 : n * 6 + j * 3 + 3, i * 6 : i * 6 + 6] = wb[i, j].T
    h[0:6, :] = 0.0
    h[:, 0:6] = 0.0
    h[0:6, 0:6] = np.eye(6)
    g[0:6] = 0.0
    h += damping * np.eye(size)
    delta = -np.linalg.solve(h, g)

    np.testing.assert_allclose(
        np.asarray(dp).ravel(), delta[: n * 6], rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(dl).ravel(), delta[n * 6 :], rtol=2e-3, atol=2e-4
    )


def test_sharded_matches_single_device():
    problem, _, _ = _synthetic_problem(seed=1)
    mesh = Mesh(np.asarray(jax.devices()[:8]), (ba.OBS_AXIS,))
    poses_s, lm_s = ba.optimize(problem, iterations=4, mesh=mesh)
    poses_1, lm_1 = ba.optimize(problem, iterations=4)
    rel = poses_1.inverse() @ poses_s
    assert float(jnp.max(jnp.linalg.norm(rel.log(), axis=-1))) < 1e-4
    np.testing.assert_allclose(np.asarray(lm_s), np.asarray(lm_1), atol=1e-4)


def test_noisy_observations_converge():
    problem, poses_gt, _ = _synthetic_problem(seed=2, px_noise=0.5)
    poses, landmarks = ba.optimize(problem, iterations=8)
    refined = ba.BAProblem(
        poses, landmarks, problem.obs_pose, problem.obs_landmark,
        problem.obs_uv, problem.weights, INTR, obs_z=problem.obs_z,
    )
    err = float(ba.mean_reprojection_error(refined))
    assert err < 1.0  # settles near the pixel-noise floor
    rel = poses_gt.inverse() @ poses
    assert float(jnp.max(jnp.linalg.norm(rel.log(), axis=-1))) < 5e-3


def test_coo_matches_dense_solver():
    """The COO/PCG Schur path == the dense direct path (both forced)."""
    problem, _, _ = _synthetic_problem(seed=4)
    pd, ld = ba.optimize(problem, iterations=4, solver="dense")
    pc, lc = ba.optimize(problem, iterations=4, solver="coo", cg_iters=128)
    np.testing.assert_allclose(
        np.asarray(pc.translation), np.asarray(pd.translation), atol=5e-4
    )
    np.testing.assert_allclose(np.asarray(lc), np.asarray(ld), atol=5e-4)


def test_coo_sharded_matches_single_device():
    problem, _, _ = _synthetic_problem(seed=5)
    mesh = Mesh(np.asarray(jax.devices()[:8]), (ba.OBS_AXIS,))
    ps, ls = ba.optimize(problem, iterations=3, solver="coo", mesh=mesh)
    p1, l1 = ba.optimize(problem, iterations=3, solver="coo")
    np.testing.assert_allclose(
        np.asarray(ps.translation), np.asarray(p1.translation), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(ls), np.asarray(l1), atol=1e-4)


@pytest.mark.slow
def test_coo_large_problem_scales():
    """500 poses x 50k landmarks x 200k observations: the r2 dense fill-in
    would be 500*50000*18*4 B = 1.8 TB; the COO path runs it (VERDICT r2
    next-step #4) and reduces the reprojection error."""
    rng = np.random.default_rng(11)
    n, m, o = 500, 50_000, 200_000
    landmarks_gt = jnp.asarray(
        rng.uniform([-4, -4, 2.0], [4, 4, 8.0], (m, 3)), jnp.float32
    )
    from align3d_tpu.se3 import stack

    poses = [Transform.identity()]
    for _ in range(n - 1):
        poses.append(
            poses[-1]
            @ Transform.exp(jnp.asarray(rng.normal(0, 0.01, 6), jnp.float32))
        )
    poses_gt = stack(poses)

    obs_pose = jnp.asarray(rng.integers(0, n, o), jnp.int32)
    obs_landmark = jnp.asarray(rng.integers(0, m, o), jnp.int32)

    t_cw = Transform(
        jnp.take(poses_gt.rotation, obs_pose, axis=0),
        jnp.take(poses_gt.translation, obs_pose, axis=0),
    )
    p_cam = t_cw.inverse().apply(jnp.take(landmarks_gt, obs_landmark, axis=0))
    z = p_cam[:, 2]
    u = p_cam[:, 0] * INTR.fx / z + INTR.cx
    v = p_cam[:, 1] * INTR.fy / z + INTR.cy
    problem = ba.BAProblem(
        poses=poses_gt,
        landmarks=landmarks_gt
        + jnp.asarray(rng.normal(0, 0.05, (m, 3)), jnp.float32),
        obs_pose=obs_pose,
        obs_landmark=obs_landmark,
        obs_uv=jnp.stack([u, v], axis=1),
        weights=jnp.ones(o, jnp.float32),
        intrinsics=INTR,
        obs_z=z,
    )
    err0 = float(ba.mean_reprojection_error(problem))
    poses_r, lm_r = ba.optimize(problem, iterations=2, solver="auto", cg_iters=32)
    refined = ba.BAProblem(
        poses_r, lm_r, obs_pose, obs_landmark, problem.obs_uv,
        problem.weights, INTR, obs_z=problem.obs_z,
    )
    err = float(ba.mean_reprojection_error(refined))
    assert err < 0.2 * err0
