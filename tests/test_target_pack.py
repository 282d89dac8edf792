"""Packed tap table must reproduce the reference bilinear sampler exactly.

The ICP inner loop replaced per-tap gathers with one packed (N, 12) row
gather (align3d_tpu/ops/target_pack.py); these tests pin the packed path to
the direct ``bilinear_grad`` implementation (itself pinned to
src/intensity_map.rs:150-210 by tests/test_intensity_map.py) over dense and
adversarial coordinates — including the u + 0.005 cell-crossing case.
"""

import jax.numpy as jnp
import numpy as np

from align3d_tpu.ops.intensity import bilinear_grad, build_intensity_map
from align3d_tpu.ops.target_pack import (
    pack_geometry,
    pack_intensity_taps,
    taps_bilinear_grad,
)


def _sample_setup(seed=0, h=24, w=32):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(h, w), dtype=np.uint8)
    m = build_intensity_map(jnp.asarray(img))
    taps = pack_intensity_taps(m)
    return m, taps, h, w


def _compare(m, taps, w, u, v):
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    base = jnp.trunc(v).astype(jnp.int32) * w + jnp.trunc(u).astype(jnp.int32)
    got = taps_bilinear_grad(jnp.take(taps, base, axis=0), u, v)
    want = bilinear_grad(m, u, v)
    for g, e in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(e))


def test_taps_match_bilinear_grad_dense():
    m, taps, h, w = _sample_setup()
    rng = np.random.default_rng(1)
    u = rng.uniform(0, w - 1, size=512).astype(np.float32)
    v = rng.uniform(0, h - 1, size=512).astype(np.float32)
    _compare(m, taps, w, u, v)


def test_taps_match_at_cell_crossing():
    # fu + 0.005 >= 1 crosses into the next cell; the reference re-truncates
    # (src/intensity_map.rs:184-210) — the packed path must select the
    # shifted sub-quad of the 3x3 neighborhood.
    m, taps, h, w = _sample_setup()
    u = np.array([3.996, 5.999, 0.9999, float(w - 1)], np.float32)
    v = np.array([2.997, 1.5, float(h - 1), 7.9995], np.float32)
    _compare(m, taps, w, u, v)


def test_taps_match_on_integer_coords():
    m, taps, h, w = _sample_setup()
    u, v = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32)
    )
    _compare(m, taps, w, u.ravel(), v.ravel())


def test_pack_geometry_layout():
    rng = np.random.default_rng(2)
    h, w = 6, 8
    pts = rng.standard_normal((h, w, 3)).astype(np.float32)
    nrm = rng.standard_normal((h, w, 3)).astype(np.float32)
    mask = rng.integers(0, 2, size=(h, w)).astype(bool)
    table = np.asarray(pack_geometry(jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(mask)))
    assert table.shape == (h * w, 8)
    np.testing.assert_array_equal(table[:, 0:3], pts.reshape(-1, 3))
    np.testing.assert_array_equal(table[:, 3:6], nrm.reshape(-1, 3))
    np.testing.assert_array_equal(table[:, 6] > 0, mask.reshape(-1))
