"""IntensityMap invariants (reference ``src/intensity_map.rs:228-262``)."""

import jax.numpy as jnp
import numpy as np

from align3d_tpu.ops.intensity import bilinear, bilinear_grad, build_intensity_map


def test_border_should_repeat(bloei_luma8):
    m = build_intensity_map(jnp.asarray(bloei_luma8))
    h, w = bloei_luma8.shape
    v = bilinear(m, jnp.float32(0.0), jnp.float32(h - 1 + 0.25))
    assert float(v) == np.float32(bloei_luma8[h - 1, 0]) / np.float32(255.0)
    v = bilinear(m, jnp.float32(w - 1 + 0.25), jnp.float32(0.0))
    assert float(v) == np.float32(bloei_luma8[0, w - 1]) / np.float32(255.0)


def test_round_uv_matches_image(bloei_luma8):
    m = build_intensity_map(jnp.asarray(bloei_luma8))
    for y, x in [(20, 0), (33, 44), (12, 48)]:
        v = bilinear(m, jnp.float32(x), jnp.float32(y))
        assert float(v) == np.float32(bloei_luma8[y, x]) / np.float32(255.0)


def test_values_vectorized(bloei_luma8):
    m = build_intensity_map(jnp.asarray(bloei_luma8))
    h, w = bloei_luma8.shape
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    vals, _, _ = bilinear_grad(
        m, jnp.asarray(xs, jnp.float32).ravel(), jnp.asarray(ys, jnp.float32).ravel()
    )
    np.testing.assert_array_equal(
        np.asarray(vals).reshape(h, w), bloei_luma8.astype(np.float32) / 255.0
    )


def test_bilinear_interpolates():
    img = jnp.asarray(np.array([[0, 255], [0, 255]], np.uint8))
    m = build_intensity_map(img)
    v = bilinear(m, jnp.float32(0.5), jnp.float32(0.0))
    assert abs(float(v) - 0.5) < 1e-6


def test_gradient_direction():
    img = jnp.asarray((np.arange(16)[None, :] * 16 * np.ones((16, 1))).astype(np.uint8))
    m = build_intensity_map(img)
    _, du, dv = bilinear_grad(m, jnp.float32(5.25), jnp.float32(5.25))
    assert float(du) > 0.0  # increases along +u
    assert abs(float(dv)) < 1e-3
