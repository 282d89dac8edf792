"""v4 slim int-packed ICP kernel vs the exact XLA path (interpret mode).

v4 quantizes target normals to bf16 (~2^-8 relative) and runs the reduction
stack in bf16 with f32 accumulation, so — unlike v3 — the accumulated
systems carry ~0.4% input-quantization noise and a few more borderline gate
flips. The aligned pose must still land within the same small-scene
tolerance as v3 (the quantization error is second-order for a GN step).
"""

import numpy as np
import jax.numpy as jnp

from align3d_tpu.camera import CameraIntrinsics
from align3d_tpu.icp.image_icp import (
    align_impl,
    align_impl_pallas_v4,
    align_impl_pallas_v4_batched,
    icp_step,
)
from align3d_tpu.icp.params import IcpParams
from align3d_tpu.ops import icp_pallas_v3 as k3
from align3d_tpu.ops import icp_pallas_v4 as k4
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


def test_pack_target_roundtrip():
    """The 5-channel int pack decodes back to z (exact), bf16 normals, and
    u8-exact taps — the kernel's decode math, checked on the host."""
    h, w = 48, 256
    _, target, _ = _pair(h, w)
    tp = np.asarray(k4.pack_target(
        target.points, target.normals, target.mask, target.intensity_map
    ))
    g = tp.shape[0]
    assert tp.shape == (g, k4.NCH, -(-h // k3.CHUNK) * k3.CHUNK, 128)
    # (G, NCH, Hp, 128) -> (NCH, H, W)
    chans = tp.transpose(1, 2, 0, 3).reshape(k4.NCH, tp.shape[2], g * 128)[
        :, :h, :w
    ]
    z = chans[0].view(np.float32)
    np.testing.assert_array_equal(
        z, np.asarray(target.points[..., 2] * target.mask)
    )
    nx = (chans[1] & np.int32(-65536)).view(np.float32)
    ny = (chans[1] << 16).view(np.float32)
    nz = (chans[2] & np.int32(-65536)).view(np.float32)
    ref_n = np.asarray(target.normals)
    for got, ref in ((nx, ref_n[..., 0]), (ny, ref_n[..., 1]), (nz, ref_n[..., 2])):
        np.testing.assert_allclose(
            got, ref.astype(jnp.bfloat16).astype(np.float32), atol=0
        )
    # tap[8][v, u] samples the bordered map at (v+1, u+1) — the pixel itself
    # (taps use a top/left edge pre-pad so dv/du in {0,1,2} mean {-1,0,+1});
    # it is packed into c2's low byte.
    center = chans[2] & 0xFF
    ref_tap = np.round(np.asarray(target.intensity_map[1:-1, 1:-1]) * 255.0)
    np.testing.assert_array_equal(center, ref_tap)


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
    tp = k4.pack_target(
        target.points, target.normals, target.mask, target.intensity_map
    )
    pt = (params.max_distance, params.max_normal_angle, params.max_color_distance)
    cb, dyb, dxb = k3.predict_bases(rot, tr, sp, intr, h)
    geo_aug, col_aug = k4.icp_step_pallas(
        rot, tr, cb, dyb, dxb, sp, tp, intr, h, w, pt, interpret=True
    )

    # bf16 normals + bf16 reduction stack: ~0.4% relative input noise on top
    # of v3's borderline gate chatter.
    for aug, sys in ((geo_aug, geom), (col_aug, color)):
        assert abs(float(aug[7, 7]) - float(sys.count)) <= 8
        hs = np.asarray(sys.hessian)
        np.testing.assert_allclose(
            np.asarray(aug[0:6, 0:6]), hs, rtol=2e-2, atol=1e-2 * np.abs(hs).max()
        )
        gs = np.asarray(sys.gradient)
        np.testing.assert_allclose(
            np.asarray(aug[0:6, 6]), gs, rtol=2e-2, atol=2e-2 * np.abs(gs).max()
        )
        np.testing.assert_allclose(
            float(aug[6, 6]), float(sys.squared_residual_sum), rtol=2e-2
        )


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
    r_p, t_p, res_p = align_impl_pallas_v4(*args, interpret=True)
    # Banded drop of border correspondences (as v3) + bf16 quantization: the
    # pose still lands well inside the 0.01 rad real-data bar.
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_x), atol=4e-3)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x), atol=4e-3)
    np.testing.assert_allclose(float(res_p), float(res_x), rtol=8e-2)


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
    r1, t1, res1 = align_impl_pallas_v4(
        jnp.eye(3), jnp.zeros(3), *flat, intr, params, interpret=True
    )
    bargs = tuple(jnp.broadcast_to(a[None], (2,) + a.shape) for a in flat)
    rb, tb, resb = align_impl_pallas_v4_batched(
        jnp.broadcast_to(jnp.eye(3)[None], (2, 3, 3)),
        jnp.zeros((2, 3)),
        *bargs,
        intr,
        params,
        interpret=True,
    )
    for b in range(2):
        np.testing.assert_allclose(np.asarray(rb[b]), np.asarray(r1), atol=2e-3)
        np.testing.assert_allclose(np.asarray(tb[b]), np.asarray(t1), atol=2e-3)


def test_huber_step_matches_xla_systems():
    """Non-binary Huber IRLS weights flow through the kernel identically to
    the XLA engine (reference robust_estimator.rs:10-28; weight applied once
    on H = J^T W J, inherited by the color weight)."""
    h, w = 48, 256
    intr, target, source = _pair(h, w)
    delta = 0.004  # small enough that many residuals get down-weighted
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
    tp = k4.pack_target(
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
    geo_aug, col_aug = k4.icp_step_pallas(
        rot, tr, cb, dyb, dxb, sp, tp, intr, h, w, pt, interpret=True
    )
    # The huberized weight sum must be well below the gate count (proves the
    # weights actually bite) and the systems must agree within bf16 noise.
    plain_count = float(
        k4.icp_step_pallas(
            rot, tr, cb, dyb, dxb, sp, tp, intr, h, w, pt[:4], interpret=True
        )[0][7, 7]
    )
    assert float(geo_aug[7, 7]) < plain_count - 1.0
    for aug, sys in ((geo_aug, geom), (col_aug, color)):
        np.testing.assert_allclose(
            float(aug[7, 7]), float(sys.count), rtol=3e-2
        )
        hs = np.asarray(sys.hessian)
        np.testing.assert_allclose(
            np.asarray(aug[0:6, 0:6]), hs, rtol=2e-2, atol=1e-2 * np.abs(hs).max()
        )
        gs = np.asarray(sys.gradient)
        np.testing.assert_allclose(
            np.asarray(aug[0:6, 6]), gs, rtol=2e-2, atol=3e-2 * np.abs(gs).max()
        )


def test_huber_align_matches_xla_pose():
    h, w = 32, 128
    intr, target, source = _pair(h, w)
    params = IcpParams(max_iterations=3, huber_delta=0.01)
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
    ref_rot, ref_tr, _ = align_impl(*args)
    got_rot, got_tr, _ = align_impl_pallas_v4(*args, interpret=True)
    d = Transform(got_rot, got_tr) @ Transform(ref_rot, ref_tr).inverse()
    assert float(d.angle()) < 2e-3
    # bf16 pack noise is amplified slightly by the non-binary IRLS weights.
    assert float(jnp.linalg.norm(d.translation)) < 5e-3
