"""Fused Pallas ICP kernel vs the exact XLA path (interpret mode on CPU).

The banded-gather kernel (align3d_tpu/ops/icp_pallas.py) must reproduce the
XLA engine's accumulation exactly when all displacements fall inside the
band: identical gate counts and f32-reassociation-level agreement on the
normal equations and the converged pose.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from align3d_tpu.camera import CameraIntrinsics
from align3d_tpu.icp.image_icp import align_impl, align_impl_pallas, icp_step
from align3d_tpu.icp.params import IcpParams
from align3d_tpu.ops import icp_pallas
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

    sp = icp_pallas.pack_source(source.points, source.mask, source.intensities)
    tp = icp_pallas.pack_target(
        target.points, target.normals, target.mask, target.intensity_map
    )
    pt = (params.max_distance, params.max_normal_angle, params.max_color_distance)
    cb, dyb, dxb = icp_pallas.predict_bases(rot, tr, sp, intr, h)
    geo_aug, col_aug, stats = icp_pallas.icp_step_pallas(
        rot, tr, cb, dyb, dxb, sp, tp, intr, h, w, pt, interpret=True
    )

    # The packed target quantizes normals to 12 bits, so the angle gate can
    # flip for pixels within 2.5e-4 of the threshold: counts agree to a
    # handful of pixels, sums to the corresponding relative tolerance (plus
    # f32 reassociation between the single-pass MXU contraction and XLA's
    # reduction tree).
    n_px = h * w
    for aug, sys in ((geo_aug, geom), (col_aug, color)):
        assert abs(float(aug[7, 7]) - float(sys.count)) <= max(3, 1e-3 * n_px)
        np.testing.assert_allclose(
            np.asarray(aug[0:6, 0:6]), np.asarray(sys.hessian), rtol=5e-3, atol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(aug[0:6, 6]), np.asarray(sys.gradient), rtol=5e-3, atol=5e-2
        )
        np.testing.assert_allclose(
            float(aug[6, 6]), float(sys.squared_residual_sum), rtol=5e-3
        )

    # Stats reduce to usable next-iteration bases.
    cb2, dyb2, dxb2 = icp_pallas.bases_from_stats(stats, dyb, dxb, sp.shape[0])
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
    r_p, t_p, res_p = align_impl_pallas(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_x), atol=5e-5)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x), atol=5e-5)
    np.testing.assert_allclose(float(res_p), float(res_x), rtol=1e-4)


def test_batched_align_matches_single():
    from align3d_tpu.icp.image_icp import align_impl_pallas_batched

    h, w = 32, 128
    intr, t0_, s0_ = _pair(h, w, seed=0)
    _, t1_, s1_ = _pair(h, w, seed=1)
    params = IcpParams(max_iterations=2)
    n = h * w

    def flat(ri):
        return (
            ri.points.reshape(n, 3),
            ri.mask.reshape(n),
            ri.intensities.reshape(n),
            ri.normals.reshape(n, 3) if ri.normals is not None else None,
            ri.intensity_map,
        )

    singles = []
    for tgt, src in ((t0_, s0_), (t1_, s1_)):
        sp, sm, si, _, _ = flat(src)
        tp, tm, _, tn, tim = flat(tgt)
        singles.append(
            align_impl_pallas(
                jnp.eye(3), jnp.zeros(3), sp, sm, si, tp, tm, tn, tim,
                intr, params, interpret=True,
            )
        )

    import numpy as _np

    def stack(items):
        return jnp.stack(items, axis=0)

    br, bt, bres = align_impl_pallas_batched(
        stack([jnp.eye(3)] * 2),
        stack([jnp.zeros(3)] * 2),
        stack([s0_.points.reshape(n, 3), s1_.points.reshape(n, 3)]),
        stack([s0_.mask.reshape(n), s1_.mask.reshape(n)]),
        stack([s0_.intensities.reshape(n), s1_.intensities.reshape(n)]),
        stack([t0_.points.reshape(n, 3), t1_.points.reshape(n, 3)]),
        stack([t0_.mask.reshape(n), t1_.mask.reshape(n)]),
        stack([t0_.normals.reshape(n, 3), t1_.normals.reshape(n, 3)]),
        stack([t0_.intensity_map, t1_.intensity_map]),
        intr,
        params,
        interpret=True,
    )
    for k in range(2):
        r_s, t_s, res_s = singles[k]
        _np.testing.assert_allclose(_np.asarray(br[k]), _np.asarray(r_s), atol=1e-5)
        _np.testing.assert_allclose(_np.asarray(bt[k]), _np.asarray(t_s), atol=1e-5)


def test_pallas_engine_huber_matches_xla():
    """Huber IRLS weights are supported by every Pallas engine (previously a
    NotImplementedError); pose parity vs the XLA engine."""
    h, w = 32, 128
    intr, target, source = _pair(h, w)
    params = IcpParams(max_iterations=2, huber_delta=0.01)
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
    got_rot, got_tr, _ = align_impl_pallas(*args, interpret=True)
    d = Transform(got_rot, got_tr) @ Transform(ref_rot, ref_tr).inverse()
    assert float(d.angle()) < 1e-3
    assert float(jnp.linalg.norm(d.translation)) < 1e-3
