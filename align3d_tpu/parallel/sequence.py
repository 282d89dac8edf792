"""Sequence parallelism over the frame axis with ppermute halo exchange.

SURVEY §5 ("long-context / sequence parallelism"): the analog of scaling
sequence length here is scaling the FRAME axis of a capture. This module
shards a frame sequence across the device mesh and runs the whole odometry
pipeline under ``shard_map``:

* each device holds a contiguous block of F = N/D frames;
* pair (f, f-1) at a block boundary needs the LAST frame of the previous
  device's block — that one frame is exchanged with a single
  ``jax.lax.ppermute`` hop over ICI (the halo exchange SURVEY §2.6/§5 plans;
  device 0 receives zeros, and its dummy first pair is dropped);
* pyramids, multiscale ICP and the per-pair relative poses are computed
  entirely device-local;
* the tiny (N, 3, 3)+(N, 3) relative poses are ``all_gather``-ed and
  composed with the replicated ``associative_scan`` parallel prefix.

Per-device compute is O(N/D) with communication = one frame per device pair
plus one small all-gather — the ICI-friendly layout (contrast with
:func:`align3d_tpu.parallel.batch.odometry_step`, which shards the PAIR axis
and lets XLA reshard the [1:]/[:-1] slices).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from align3d_tpu.camera import CameraIntrinsics
from align3d_tpu.icp.params import MsIcpParams
from align3d_tpu.parallel.batch import (
    build_pyramids_batched,
    multiscale_align_batched,
)
from align3d_tpu.se3 import Transform
from align3d_tpu.trajectory import Trajectory, accumulate_scan

Array = jax.Array


def odometry_sequence_parallel(
    intrinsics: CameraIntrinsics,
    depth_scale: float,
    colors: Array,  # (N, H, W, 3) u8 — N consecutive frames
    depths: Array,  # (N, H, W) u16
    mesh: Mesh,
    params: MsIcpParams | None = None,
    pyramid_levels: int = 3,
) -> Trajectory:
    """Whole-sequence odometry, frame axis sharded over ``mesh`` axis 0.

    Returns a replicated :class:`Trajectory` with N poses (frame 0 at the
    origin), identical (to float tolerance) to the single-device
    :func:`align3d_tpu.parallel.batch.odometry_step` result.
    """
    params = params or MsIcpParams.default()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = colors.shape[0]

    pad = (-n) % n_dev
    if pad:
        # Repeat the last frame; the padded pairs align a frame to itself
        # (relative = identity) and are trimmed after the scan.
        colors = jnp.concatenate([colors, jnp.tile(colors[-1:], (pad, 1, 1, 1))])
        depths = jnp.concatenate([depths, jnp.tile(depths[-1:], (pad, 1, 1))])

    fwd = [(i, i + 1) for i in range(n_dev - 1)]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def shard_fn(colors_b: Array, depths_b: Array):
        # Halo exchange: previous shard's last frame -> this shard's front.
        halo_c = jax.lax.ppermute(colors_b[-1], axis, fwd)
        halo_d = jax.lax.ppermute(depths_b[-1], axis, fwd)
        colors_ext = jnp.concatenate([halo_c[None], colors_b], axis=0)
        depths_ext = jnp.concatenate([halo_d[None], depths_b], axis=0)

        pyr = build_pyramids_batched(
            intrinsics,
            depth_scale,
            colors_ext,
            depths_ext,
            pyramid_levels=pyramid_levels,
        )
        source_pyr = [jax.tree.map(lambda a: a[1:], ri) for ri in pyr]
        target_pyr = [jax.tree.map(lambda a: a[:-1], ri) for ri in pyr]
        rel = multiscale_align_batched(target_pyr, source_pyr, params)  # (F,)

        rot = jax.lax.all_gather(rel.rotation, axis)  # (D, F, 3, 3)
        trans = jax.lax.all_gather(rel.translation, axis)
        return rot.reshape(-1, 3, 3), trans.reshape(-1, 3)

    rot, trans = jax.jit(shard_fn)(colors, depths)
    # Drop device 0's dummy first pair (its halo frame is ppermute zeros),
    # then compose. Trim any padding tail.
    relative = Transform(rot[1:], trans[1:])
    traj = accumulate_scan(relative)
    if pad:
        traj = traj.slice(0, n)
    return Trajectory(traj.camera_to_world, jnp.arange(n, dtype=jnp.float32))
