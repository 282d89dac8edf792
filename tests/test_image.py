"""RgbdImage/RgbdFrame downsample + Huber weights.

Reference behaviors: ``Downsample for RgbdImage`` (blur+stride-2 color,
bilateral filter-then-decimate depth, src/image/rgbd_image.rs:45-59),
``Downsample for RgbdFrame`` (adds intrinsics.scale(0.5), :95-106), and the
Huber estimator (src/optim/robust_estimator.rs:10-28 — defined but unused in
the reference; wired default-off here).
"""

import numpy as np
import pytest

from align3d_tpu.image import RgbdFrame, RgbdImage
from align3d_tpu.optim.gauss_newton import huber_weight


def _synthetic_rgbd(h=64, w=80, seed=3):
    rng = np.random.default_rng(seed)
    color = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    depth = (1000 + rng.integers(0, 500, size=(h, w))).astype(np.uint16)
    return RgbdImage(color=color, depth=depth, depth_scale=0.001)


def test_rgbd_image_downsample_shapes_and_dtypes():
    img = _synthetic_rgbd()
    half = img.downsample(1.0)
    assert half.color.shape == (32, 40, 3) and half.color.dtype == np.uint8
    assert half.depth.shape == (32, 40) and half.depth.dtype == np.uint16
    assert half.depth_scale == img.depth_scale
    # Bilateral filter preserves the flat depth plateau up to smoothing noise.
    assert abs(float(half.depth.mean()) - float(img.depth.mean())) < 50


def test_rgbd_frame_downsample_scales_intrinsics():
    from align3d_tpu.camera import CameraIntrinsics

    img = _synthetic_rgbd()
    intr = CameraIntrinsics(fx=60.0, fy=60.0, cx=39.5, cy=31.5, width=80, height=64)
    frame = RgbdFrame(camera=intr, image=img)
    half = frame.downsample(1.0)
    assert half.camera.fx == pytest.approx(30.0)
    assert half.camera.width == 40 and half.camera.height == 32
    assert half.image.color.shape == (32, 40, 3)
    assert half.camera_to_world is None and half.get_pinhole_camera() is None


def test_huber_weight_values():
    r = np.array([0.0, 0.5, 1.0, -2.0, 4.0], dtype=np.float32)
    w = np.asarray(huber_weight(r, 1.0))
    # |r| <= delta -> 1; else delta/|r| (robust_estimator.rs:20-27).
    np.testing.assert_allclose(w, [1.0, 1.0, 1.0, 0.5, 0.25], rtol=1e-6)


def test_py_scale_down_fast_path_matches_reference_path():
    """The fused planar blur+decimate matmul == blur-then-slice (interior
    exact; border columns may differ by 1 u8 step from f32 weight
    pre-summation at the clipped taps)."""
    import numpy as np
    import jax.numpy as jnp

    from align3d_tpu.image import _decimate2, gaussian_blur, py_scale_down

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (64, 96, 3)).astype(np.uint8))
    fast = np.asarray(py_scale_down(img, 1.0)).astype(np.int64)
    ref = np.asarray(
        jnp.clip(_decimate2(gaussian_blur(img, 1.0), 32, 48), 0.0, 255.0).astype(
            jnp.uint8
        )
    ).astype(np.int64)
    assert np.abs(fast - ref).max() <= 1
    np.testing.assert_array_equal(fast[2:-2, 2:-2], ref[2:-2, 2:-2])
