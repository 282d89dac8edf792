"""End-to-end odometry accuracy oracle on the committed sample fixtures.

The reference's headline accuracy claim is mean trajectory error
angle 1.91 deg / translation 0.03885 on IndoorLidar bedroom-20
(reference README.md:115-117). That dataset is not redistributable inside
this image, so the enforced end-to-end oracle runs the identical pipeline
(bilateral + normals + intensity, 3-level pyramid, MsIcpParams defaults)
on the reference's own committed SlamTb fixtures and holds the result to a
bound an order of magnitude TIGHTER than the published bedroom number —
regression here would surface long before the bedroom gate is at risk.
"""

import math

import pytest

from align3d_tpu.odometry import run_odometry


@pytest.mark.slow
def test_full_pipeline_trajectory_error_sample1(sample1_dataset):
    result = run_odometry(sample1_dataset, max_frames=10)
    assert result.metrics is not None
    angle_deg = math.degrees(float(result.metrics.angle))
    assert angle_deg < 0.5, f"mean trajectory angle error {angle_deg:.3f} deg"
    trans = float(result.metrics.translation)
    assert trans < 0.01, f"mean trajectory translation error {trans:.4f}"
