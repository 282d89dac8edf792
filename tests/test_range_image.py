"""RangeImage pipeline tests with golden oracles from the reference suite.

Key cross-implementation oracles (SURVEY.md §4):
* sample1 frame 0 backprojects to exactly 270,213 valid points
  (``src/range_image/structure.rs:483``);
* the normal at [44, 42] has unit norm (``structure.rs:473-474``);
* 3-level pyramid shapes and intrinsics halving.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from align3d_tpu.ops import normals as normals_ops
from align3d_tpu.range_image import RangeImage, RangeImageBuilder


@pytest.fixture(scope="module")
def sample1_frame0(sample1_dataset):
    return sample1_dataset.get(0)


def test_backprojection_golden_count(sample1_frame0):
    ri = RangeImage.from_frame(sample1_frame0)
    assert ri.height == 480 and ri.width == 640
    assert int(ri.valid_points_count()) == 270213


def test_backprojection_geometry(sample1_frame0):
    ri = RangeImage.from_frame(sample1_frame0)
    mask = np.asarray(ri.mask)
    pts = np.asarray(ri.points)
    depth = sample1_frame0.image.depth
    # Valid pixels: z = depth * scale, invalid pixels: zero point.
    v, u = 240, 320
    assert mask[v, u] == (depth[v, u] > 0)
    if mask[v, u]:
        np.testing.assert_allclose(
            pts[v, u, 2], depth[v, u] * sample1_frame0.image.depth_scale, rtol=1e-6
        )
    assert np.all(pts[~mask.astype(bool)] == 0.0)


def test_normals_golden(sample1_frame0):
    ri = RangeImage.from_frame(sample1_frame0).with_normals()
    normals = np.asarray(ri.normals)
    assert normals.shape == (480, 640, 3)
    np.testing.assert_allclose(np.linalg.norm(normals[44, 42]), 1.0, atol=1e-5)
    # All nonzero normals are unit.
    norms = np.linalg.norm(normals.reshape(-1, 3), axis=1)
    nonzero = norms > 0
    np.testing.assert_allclose(norms[nonzero], 1.0, atol=1e-4)


def test_normals_synthetic_plane():
    # A flat z=1 plane must give normals along -z or +z everywhere inside.
    h, w = 16, 16
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pts = np.stack([xs * 0.01, ys * 0.01, np.ones_like(xs, np.float32)], axis=-1)
    mask = np.ones((h, w), bool)
    n = np.asarray(normals_ops.compute_normals(jnp.asarray(pts, jnp.float32), jnp.asarray(mask)))
    inner = n[2:-2, 2:-2]
    assert np.all(np.abs(inner[..., 2]) > 0.999)


def test_pyramid_shapes(sample1_frame0):
    builder = RangeImageBuilder(with_normals=True, with_intensity=True, pyramid_levels=3)
    levels = builder.build(sample1_frame0)
    assert len(levels) == 3
    assert [(l.height, l.width) for l in levels] == [(480, 640), (240, 320), (120, 160)]
    assert levels[1].intrinsics.fx == pytest.approx(levels[0].intrinsics.fx * 0.5)
    assert levels[2].intrinsics.fx == pytest.approx(levels[0].intrinsics.fx * 0.25)
    for lvl in levels:
        assert lvl.normals is not None
        assert lvl.intensities is not None
        assert lvl.intensity_map is not None
        assert lvl.intensity_map.shape == (lvl.height + 2, lvl.width + 2)
        # Downsampled masks keep a sensible number of valid points.
        assert int(lvl.valid_points_count()) > 0


def test_pyramid_determinism(sample1_frame0):
    builder = RangeImageBuilder()
    a = builder.build(sample1_frame0)
    b = builder.build(sample1_frame0)
    np.testing.assert_array_equal(np.asarray(a[1].points), np.asarray(b[1].points))
    np.testing.assert_array_equal(np.asarray(a[2].mask), np.asarray(b[2].mask))


def test_intensity_matches_luma(sample1_frame0):
    ri = RangeImage.from_frame(sample1_frame0).with_intensity()
    colors = np.asarray(ri.colors).astype(np.float32)
    expected = (
        colors[..., 0] * 0.3 + colors[..., 1] * 0.59 + colors[..., 2] * 0.11
    ).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(ri.intensities), expected)
