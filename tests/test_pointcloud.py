"""PointCloud container tests (reference src/pointcloud.rs behavior)."""

import jax.numpy as jnp
import numpy as np

from align3d_tpu.pointcloud import PointCloud
from align3d_tpu.se3 import Transform


def _cloud(n=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    nrm = rng.standard_normal((n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    mask = rng.random(n) > 0.25
    return PointCloud(
        jnp.asarray(pts),
        jnp.asarray(mask),
        normals=jnp.asarray(nrm),
        colors=jnp.asarray(rng.integers(0, 255, (n, 3), dtype=np.uint8)),
    )


def test_transform_points_and_normals():
    pc = _cloud()
    t = Transform.exp(jnp.asarray([0.1, -0.2, 0.3, 0.2, -0.1, 0.15]))
    out = pc.transformed(t)
    np.testing.assert_allclose(
        np.asarray(out.points), np.asarray(t.apply(pc.points)), atol=1e-6
    )
    # Normals rotate only (pointcloud.rs:47-52) and stay unit.
    norms = np.linalg.norm(np.asarray(out.normals), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_compacted_matches_mask():
    pc = _cloud()
    c = pc.compacted()
    assert len(c) == int(np.asarray(pc.mask).sum())
    np.testing.assert_array_equal(
        np.asarray(c.points), np.asarray(pc.points)[np.asarray(pc.mask)]
    )
    assert bool(jnp.all(c.mask))


def test_from_range_image_and_geometry_roundtrip():
    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.range_image import RangeImage

    rng = np.random.default_rng(1)
    h, w = 12, 16
    intr = CameraIntrinsics(fx=10.0, fy=10.0, cx=8.0, cy=6.0, width=w, height=h)
    depth = rng.integers(0, 3000, (h, w)).astype(np.uint16)
    ri = RangeImage.from_rgbd(
        intr, rng.integers(0, 255, (h, w, 3), dtype=np.uint8), depth, 0.001
    )
    pc = PointCloud.from_range_image(ri)
    assert len(pc) == h * w
    assert int(pc.len_valid()) == int((depth > 0).sum())

    geo = pc.to_geometry()
    assert geo.points.shape[0] == int(pc.len_valid())
    back = PointCloud.from_geometry(geo)
    np.testing.assert_array_equal(back.points, geo.points)


def test_stage_timer():
    from align3d_tpu.utils import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a", force=jnp.ones(3)):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.report()
