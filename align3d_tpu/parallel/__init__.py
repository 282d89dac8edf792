"""Scale-out: frame-pair batching, device-mesh sharding, distributed refinement.

The reference has no distributed story (SURVEY.md §2.6 — rayon threads only);
this package is the beyond-reference scale layer: ``vmap`` over frame pairs,
``jax.sharding`` data-parallelism over a device mesh, ``associative_scan``
odometry composition, a sharded pose-graph Gauss-Newton refinement
(:mod:`.pose_graph`), and landmark bundle adjustment with a distributed
Schur-complement reduction (:mod:`.bundle_adjustment`).
"""

from align3d_tpu.parallel.batch import (
    build_pyramids_batched,
    multiscale_align_batched,
    odometry_step,
    make_mesh,
)
from align3d_tpu.parallel.bundle_adjustment import BAProblem
from align3d_tpu.parallel.sequence import odometry_sequence_parallel

__all__ = [
    "build_pyramids_batched",
    "multiscale_align_batched",
    "odometry_step",
    "make_mesh",
    "BAProblem",
    "odometry_sequence_parallel",
]
