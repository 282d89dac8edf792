"""Camera model tests (golden values from reference ``src/camera.rs:205-243``)."""

import jax.numpy as jnp
import numpy as np

from align3d_tpu.camera import CameraIntrinsics, PinholeCamera
from align3d_tpu.se3 import Transform


def make_cam():
    return CameraIntrinsics(fx=50.0, fy=50.0, cx=0.0, cy=0.0, width=100, height=100)


def test_project():
    cam = PinholeCamera(make_cam(), Transform.identity())
    u, v, _ = cam.project(jnp.asarray([1.0, 1.0, 1.0]))
    assert float(u) == 50.0 and float(v) == 50.0
    u, v, _ = cam.project(jnp.asarray([1.0, 1.5, 1.0]))
    assert float(u) == 50.0 and float(v) == 75.0


def test_project_to_image_mask():
    cam = PinholeCamera(make_cam(), Transform.identity())
    u, v, _, vis = cam.project_to_image(jnp.asarray([1.0, 1.0, 1.0]))
    assert bool(vis) and float(u) == 50.0 and float(v) == 50.0
    _, _, _, vis = cam.project_to_image(jnp.asarray([4.0, 1.0, 1.0]))
    assert not bool(vis)


def test_backproject_roundtrip():
    intr = CameraIntrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)
    pts = jnp.asarray([[0.3, -0.2, 1.7], [-0.5, 0.1, 0.9]])
    u, v = intr.project(pts)
    back = intr.backproject(u, v, pts[:, 2])
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_backproject_grid_matches_pointwise():
    intr = CameraIntrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=8, height=6)
    depth = jnp.arange(48, dtype=jnp.float32).reshape(6, 8) * 0.1 + 0.5
    grid = intr.backproject_grid(depth)
    assert grid.shape == (6, 8, 3)
    v, u = 3, 5
    single = intr.backproject(jnp.float32(u), jnp.float32(v), depth[v, u])
    np.testing.assert_allclose(grid[v, u], single, atol=1e-6)


def test_project_grad_matches_numeric():
    intr = CameraIntrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)
    p = jnp.asarray([0.3, -0.2, 1.7])
    dfx, dcx, dfy, dcy = intr.project_grad(p)
    eps = 1e-3
    ux0, _ = intr.project(p)
    ux1, _ = intr.project(p + jnp.asarray([eps, 0, 0]))
    np.testing.assert_allclose((ux1 - ux0) / eps, dfx, rtol=1e-3)
    uz1, _ = intr.project(p + jnp.asarray([0, 0, eps]))
    np.testing.assert_allclose((uz1 - ux0) / eps, dcx, rtol=1e-2)
    _, vy0 = intr.project(p)
    _, vy1 = intr.project(p + jnp.asarray([0, eps, 0]))
    np.testing.assert_allclose((vy1 - vy0) / eps, dfy, rtol=1e-3)


def test_scale():
    intr = CameraIntrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)
    half = intr.scale(0.5)
    assert half.fx == 262.5 and half.cx == 159.75
    assert half.width == 640  # size unchanged, as in reference scale()
