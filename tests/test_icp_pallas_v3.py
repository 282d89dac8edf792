"""v3 lean banded-gather ICP kernel vs the exact XLA path (interpret mode).

v3 stores normals unquantized and u8-exact intensity taps, so — unlike v2 —
the gate decisions match the XLA engine exactly when every displacement
falls inside the band; only f32 reassociation separates the accumulated
systems.
"""

import numpy as np
import jax.numpy as jnp

from align3d_tpu.camera import CameraIntrinsics
from align3d_tpu.icp.image_icp import (
    align_impl,
    align_impl_pallas_v3,
    align_impl_pallas_v3_batched,
    icp_step,
)
from align3d_tpu.icp.params import IcpParams
from align3d_tpu.ops import icp_pallas_v3 as k3
from align3d_tpu.ops.target_pack import pack_geometry, pack_intensity_taps
from align3d_tpu.range_image import build_pyramid_impl
from align3d_tpu.se3 import Transform


def _pair(h, w, seed=0):
    rng = np.random.default_rng(seed)
    intr = CameraIntrinsics(
        fx=0.9 * w, fy=0.9 * w, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h
    )
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    tex = rng.uniform(30, 220, size=(h, w + 8, 3)).astype(np.uint8)
    d0 = (2000 + 3 * xs + 2 * ys + rng.integers(0, 5, (h, w))).astype(np.uint16)
    d1 = (2000 + 3 * (xs + 1) + 2 * ys + rng.integers(0, 5, (h, w))).astype(
        np.uint16
    )
    d0[5:9, 10:20] = 0  # invalid patch exercises the valid gate
    target = build_pyramid_impl(
        True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex[:, :w]), jnp.asarray(d0)
    )[0]
    source = build_pyramid_impl(
        True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex[:, 1 : w + 1]), jnp.asarray(d1)
    )[0]
    return intr, target, source


def test_step_matches_xla_counts_and_systems():
    h, w = 48, 256
    intr, target, source = _pair(h, w)
    params = IcpParams()
    n = h * w
    rot, tr = jnp.eye(3), jnp.zeros(3)

    geom, color = icp_step(
        Transform(rot, tr),
        source.points.reshape(n, 3),
        source.mask.reshape(n),
        source.intensities.reshape(n),
        pack_geometry(target.points, target.normals, target.mask),
        pack_intensity_taps(target.intensity_map),
        h,
        w,
        intr,
        params,
    )

    sp = k3.pack_source(source.points, source.mask, source.intensities)
    tp = k3.pack_target(
        target.points, target.normals, target.mask, target.intensity_map
    )
    pt = (params.max_distance, params.max_normal_angle, params.max_color_distance)
    cb, dyb, dxb = k3.predict_bases(rot, tr, sp, intr, h)
    geo_aug, col_aug, stats = k3.icp_step_pallas(
        rot, tr, cb, dyb, dxb, sp, tp, intr, h, w, pt, interpret=True
    )

    # v3 rebuilds source x/y from the pixel ray and the target point from
    # (ui, vi, z): ~1-ulp coordinate differences vs the stored-point XLA path
    # flip a handful of borderline gate/cell decisions out of h*w pixels.
    # Each flipped pixel moves a system entry by at most its own (large, for
    # color gradients) contribution, so compare with an absolute floor scaled
    # to the matrix magnitude plus a small count slack.
    for aug, sys in ((geo_aug, geom), (col_aug, color)):
        assert abs(float(aug[7, 7]) - float(sys.count)) <= 5
        hs = np.asarray(sys.hessian)
        np.testing.assert_allclose(
            np.asarray(aug[0:6, 0:6]), hs, rtol=5e-3, atol=1e-3 * np.abs(hs).max()
        )
        gs = np.asarray(sys.gradient)
        np.testing.assert_allclose(
            np.asarray(aug[0:6, 6]), gs, rtol=5e-3, atol=2e-3 * np.abs(gs).max()
        )
        np.testing.assert_allclose(
            float(aug[6, 6]), float(sys.squared_residual_sum), rtol=5e-3
        )

    cb2, dyb2, dxb2 = k3.bases_from_stats(stats, dyb, dxb, sp.shape[0] * k3.CHUNK)
    assert cb2.shape == cb.shape and dyb2.shape == dyb.shape
    assert dxb2.shape == dxb.shape


def test_align_matches_xla_pose():
    h, w = 32, 128
    intr, target, source = _pair(h, w)
    params = IcpParams(max_iterations=3)
    n = h * w
    args = (
        jnp.eye(3),
        jnp.zeros(3),
        source.points.reshape(n, 3),
        source.mask.reshape(n),
        source.intensities.reshape(n),
        target.points.reshape(n, 3),
        target.mask.reshape(n),
        target.normals.reshape(n, 3),
        target.intensity_map,
        intr,
        params,
    )
    r_x, t_x, res_x = align_impl(*args)
    r_p, t_p, res_p = align_impl_pallas_v3(*args, interpret=True)
    # A 32-row image is a single prediction chunk, so the banded engine
    # drops a few more border correspondences than the exact XLA path and
    # converges to a pose ~1e-3 away (0.06 deg) — far inside the 0.01 rad
    # real-data bar, which tests/test_icp.py checks on 640x480 frames.
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_x), atol=2e-3)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x), atol=2e-3)
    np.testing.assert_allclose(float(res_p), float(res_x), rtol=5e-2)


def test_batched_matches_single():
    h, w = 32, 128
    intr, target, source = _pair(h, w)
    params = IcpParams(max_iterations=2)
    n = h * w
    flat = (
        source.points.reshape(n, 3),
        source.mask.reshape(n),
        source.intensities.reshape(n),
        target.points.reshape(n, 3),
        target.mask.reshape(n),
        target.normals.reshape(n, 3),
        target.intensity_map,
    )
    r1, t1, res1 = align_impl_pallas_v3(
        jnp.eye(3), jnp.zeros(3), *flat, intr, params, interpret=True
    )
    bargs = tuple(jnp.broadcast_to(a[None], (2,) + a.shape) for a in flat)
    rb, tb, resb = align_impl_pallas_v3_batched(
        jnp.broadcast_to(jnp.eye(3)[None], (2, 3, 3)),
        jnp.zeros((2, 3)),
        *bargs,
        intr,
        params,
        interpret=True,
    )
    # vmapped packing/prediction reassociates f32 sums vs the single-pair
    # program, which can flip borderline gates (same chatter as the XLA
    # comparison above) — compare at the same pose tolerance.
    for b in range(2):
        np.testing.assert_allclose(np.asarray(rb[b]), np.asarray(r1), atol=2e-3)
        np.testing.assert_allclose(np.asarray(tb[b]), np.asarray(t1), atol=2e-3)


def test_huber_step_matches_xla_systems():
    """Huber IRLS weights in the v3 kernel match the XLA engine exactly
    (f32 pack — unlike v4 there is no quantization slack to hide behind)."""
    h, w = 48, 256
    intr, target, source = _pair(h, w)
    delta = 0.004
    params = IcpParams(huber_delta=delta)
    n = h * w
    rot, tr = jnp.eye(3), jnp.zeros(3)

    geom, color = icp_step(
        Transform(rot, tr),
        source.points.reshape(n, 3),
        source.mask.reshape(n),
        source.intensities.reshape(n),
        pack_geometry(target.points, target.normals, target.mask),
        pack_intensity_taps(target.intensity_map),
        h,
        w,
        intr,
        params,
    )

    sp = k3.pack_source(source.points, source.mask, source.intensities)
    tp = k3.pack_target(
        target.points, target.normals, target.mask, target.intensity_map
    )
    pt = (
        params.max_distance,
        params.max_normal_angle,
        params.max_color_distance,
        params.band_radius,
        delta,
    )
    cb, dyb, dxb = k3.predict_bases(rot, tr, sp, intr, h)
    geo_aug, col_aug, _ = k3.icp_step_pallas(
        rot, tr, cb, dyb, dxb, sp, tp, intr, h, w, pt, interpret=True,
        emit_stats=False,
    )
    # Non-binary IRLS weights add one extra f32 divide per residual; the
    # accumulation-order noise grows to ~4e-4 relative on the Hessian.
    for aug, sys in ((geo_aug, geom), (col_aug, color)):
        np.testing.assert_allclose(float(aug[7, 7]), float(sys.count), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(aug[0:6, 0:6]), np.asarray(sys.hessian), rtol=1.5e-3,
            atol=1e-4 * float(np.abs(np.asarray(sys.hessian)).max()),
        )
        np.testing.assert_allclose(
            np.asarray(aug[0:6, 6]), np.asarray(sys.gradient), rtol=1.5e-3,
            atol=5e-4 * float(np.abs(np.asarray(sys.gradient)).max()),
        )
