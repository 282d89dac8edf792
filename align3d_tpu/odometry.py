"""Frame-to-frame odometry pipeline.

Counterpart of the reference odometry example (``examples/src/bin/odometry.rs``):
per frame, build the RangeImage pyramid, run multiscale ICP against the
previous frame, and accumulate relative poses into a trajectory.

Two drivers:
* :func:`run_odometry` — the sequential reference flow (per-frame jitted
  compute, host loop);
* :func:`align_sequence_batched` (in :mod:`align3d_tpu.parallel.batch`) —
  the TPU throughput path: all adjacent pairs aligned as one batched
  computation, poses composed with a parallel prefix scan.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

from align3d_tpu.icp.multiscale import MultiscaleAlign
from align3d_tpu.icp.params import MsIcpParams
from align3d_tpu.metrics import TransformMetrics
from align3d_tpu.range_image import RangeImageBuilder
from align3d_tpu.se3 import Transform
from align3d_tpu.trajectory import Trajectory, TrajectoryBuilder


@dataclasses.dataclass
class OdometryResult:
    trajectory: Trajectory
    metrics: Optional[TransformMetrics]  # vs dataset GT, if available
    seconds_per_frame: float


def run_odometry(
    dataset,
    range_builder: RangeImageBuilder | None = None,
    icp_params: MsIcpParams | None = None,
    max_frames: int | None = None,
    progress: Callable[[int, int], None] | None = None,
) -> OdometryResult:
    """Sequential frame-to-frame odometry (odometry.rs:28-62 flow)."""
    range_builder = range_builder or RangeImageBuilder()
    icp_params = icp_params or MsIcpParams.default()

    n = len(dataset)
    if max_frames is not None:
        n = min(n, max_frames)

    traj_builder = TrajectoryBuilder.with_start(Transform.identity(), 0.0)
    last_pyramid = range_builder.build(dataset.get(0))

    start = time.perf_counter()
    for i in range(1, n):
        current = range_builder.build(dataset.get(i))
        align = MultiscaleAlign(icp_params, last_pyramid)
        transform = align.align(current)
        traj_builder.accumulate(transform, float(i))
        last_pyramid = current
        if progress is not None:
            progress(i, n - 1)
    elapsed = time.perf_counter() - start

    pred = traj_builder.build()
    metrics = None
    gt = dataset.trajectory()
    if gt is not None:
        gt = gt.slice(0, n).first_frame_at_origin()
        metrics = TransformMetrics.mean_trajectory_error(pred, gt)
    return OdometryResult(
        trajectory=pred,
        metrics=metrics,
        seconds_per_frame=elapsed / max(n - 1, 1),
    )
