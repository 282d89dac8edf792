"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Checks the SURVEY §4.5 requirements: the sharded batched odometry path
compiles + executes on an 8-device mesh and matches the single-device result
within f32-reassociation tolerance (pure DP must not change the math beyond
reduction ordering).
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from align3d_tpu.camera import CameraIntrinsics
from align3d_tpu.parallel import batch as pbatch


def _synthetic_sequence(n_frames: int, h: int = 48, w: int = 64):
    """Tiny synthetic RGB-D sequence: a textured RELIEF surface, shifting.

    The relief (sinusoidal bumps) matters: a featureless slanted plane
    leaves in-plane translation unconstrained, making the GN system
    near-singular and the converged pose hypersensitive to f32 reduction
    order — which is what the sharded-vs-single comparison must NOT be."""
    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(fx=40.0, fy=40.0, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h)
    base_tex = (rng.uniform(50, 200, size=(h + 16, w + 16, 3))).astype(np.uint8)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    colors, depths = [], []
    for i in range(n_frames):
        xi = xs + i
        relief = 40 * np.sin(xi * 0.35) * np.cos(ys * 0.3)
        depth = (2000 + 3 * xi + 2 * ys + relief).astype(np.uint16)
        color = base_tex[4 : 4 + h, 4 + i : 4 + i + w]
        colors.append(color)
        depths.append(depth)
    return intr, np.stack(colors), np.stack(depths)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_odometry_matches_single_device():
    intr, colors, depths = _synthetic_sequence(8)
    from align3d_tpu.icp.params import IcpParams, MsIcpParams

    params = MsIcpParams.repeat(2, IcpParams(max_iterations=3))

    traj_single = pbatch.odometry_step(
        intr, 0.001, jnp.asarray(colors), jnp.asarray(depths), params, pyramid_levels=2
    )

    mesh = pbatch.make_mesh()
    traj_sharded = pbatch.odometry_step(
        intr,
        0.001,
        jnp.asarray(colors),
        jnp.asarray(depths),
        params,
        pyramid_levels=2,
        mesh=mesh,
    )
    # Sharded reductions reassociate f32 sums; the ICP fixed-point loop
    # amplifies this (a reassociated sum can flip a gate), so compare in
    # pose space with a tolerance meaningful to the domain: per-frame
    # relative pose within 0.5 deg / 1 cm — well inside the ATE parity
    # bound (SURVEY §7 phase-5 gate) and orders below any structural
    # divergence (which shows up as degrees/decimeters).
    diff = traj_single.camera_to_world.inverse() @ traj_sharded.camera_to_world
    max_angle = float(jnp.max(diff.angle()))
    max_trans = float(jnp.max(jnp.linalg.norm(diff.translation, axis=-1)))
    assert max_angle < np.radians(0.5), max_angle
    assert max_trans < 0.01, max_trans


@pytest.mark.slow
def test_batched_multiscale_matches_sequential():
    intr, colors, depths = _synthetic_sequence(4)
    from align3d_tpu.icp.params import IcpParams, MsIcpParams
    from align3d_tpu.icp.multiscale import MultiscaleAlign
    from align3d_tpu.range_image import build_pyramid_impl

    params = MsIcpParams.repeat(2, IcpParams(max_iterations=3))

    pyrs = pbatch.build_pyramids_batched(
        intr, 0.001, jnp.asarray(colors), jnp.asarray(depths), pyramid_levels=2
    )
    src = [jax.tree.map(lambda a: a[1:], ri) for ri in pyrs]
    tgt = [jax.tree.map(lambda a: a[:-1], ri) for ri in pyrs]
    batched = pbatch.multiscale_align_batched(tgt, src, params)

    for i in range(3):
        t_pyr = build_pyramid_impl(
            True, True, 2, 1.0, intr, 0.001, jnp.asarray(colors[i]), jnp.asarray(depths[i])
        )
        s_pyr = build_pyramid_impl(
            True, True, 2, 1.0, intr, 0.001, jnp.asarray(colors[i + 1]), jnp.asarray(depths[i + 1])
        )
        seq = MultiscaleAlign(params, t_pyr).align(s_pyr)
        # vmap changes reduction layouts -> f32 reassociation, amplified by
        # the ICP fixed-point iteration (a reassociated sum can flip a gate).
        # 2e-3 on rotation entries is ~0.1 deg — far inside the ATE bound the
        # pipeline is accountable to; structural bugs show up orders larger.
        np.testing.assert_allclose(
            np.asarray(batched[i].rotation), np.asarray(seq.rotation), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(batched[i].translation), np.asarray(seq.translation), atol=2e-3
        )


def test_synthetic_alignment_recovers_shift():
    # The synthetic sequence shifts by one pixel per frame; ICP should find a
    # consistent small transform (sanity that the batched path does real work).
    intr, colors, depths = _synthetic_sequence(4)
    from align3d_tpu.icp.params import IcpParams, MsIcpParams

    params = MsIcpParams.repeat(2, IcpParams(max_iterations=5))
    traj = pbatch.odometry_step(
        intr, 0.001, jnp.asarray(colors), jnp.asarray(depths), params, pyramid_levels=2
    )
    t = np.asarray(traj.camera_to_world.translation)
    assert np.all(np.isfinite(t))
    # Motion is along +x in camera space (texture shifts), roughly constant.
    steps = np.diff(t[:, 0])
    assert np.std(steps) < 5 * abs(np.mean(steps)) + 1e-3


@pytest.mark.slow
def test_sequence_parallel_halo_exchange_matches_single_device():
    """odometry_sequence_parallel (frame axis sharded, ppermute halo) ==
    single-device odometry_step within the same pose-space tolerance."""
    from align3d_tpu.icp.params import IcpParams, MsIcpParams
    from align3d_tpu.parallel.sequence import odometry_sequence_parallel

    intr, colors, depths = _synthetic_sequence(8)
    params = MsIcpParams.repeat(2, IcpParams(max_iterations=3))

    traj_single = pbatch.odometry_step(
        intr, 0.001, jnp.asarray(colors), jnp.asarray(depths), params, pyramid_levels=2
    )
    mesh = pbatch.make_mesh()
    traj_seq = odometry_sequence_parallel(
        intr, 0.001, jnp.asarray(colors), jnp.asarray(depths), mesh,
        params, pyramid_levels=2,
    )
    assert len(traj_seq) == len(traj_single) == 8
    diff = traj_single.camera_to_world.inverse() @ traj_seq.camera_to_world
    assert float(jnp.max(diff.angle())) < np.radians(0.5)
    assert float(jnp.max(jnp.linalg.norm(diff.translation, axis=-1))) < 0.01


def test_sequence_parallel_with_padding():
    """N not divisible by the device count: padded pairs are trimmed."""
    from align3d_tpu.icp.params import IcpParams, MsIcpParams
    from align3d_tpu.parallel.sequence import odometry_sequence_parallel

    intr, colors, depths = _synthetic_sequence(6)
    params = MsIcpParams.repeat(2, IcpParams(max_iterations=3))
    mesh = pbatch.make_mesh()
    traj = odometry_sequence_parallel(
        intr, 0.001, jnp.asarray(colors), jnp.asarray(depths), mesh,
        params, pyramid_levels=2,
    )
    assert len(traj) == 6
    # Frame 0 at origin; motion is monotone in x, so translations are finite
    # and nonzero past frame 0.
    t = np.asarray(traj.camera_to_world.translation)
    assert np.all(np.isfinite(t))
    np.testing.assert_allclose(t[0], 0.0, atol=1e-6)
    assert np.linalg.norm(t[-1]) > 1e-3
