"""The two published-dataset BASELINE gates (skipped unless data present).

Fetch the datasets first (needs network):

    python tools/fetch_datasets.py bedroom tum_fr1_desk
    ALIGN3D_DATASETS_DIR=datasets python -m pytest tests/test_published_gates.py -v

Gate 1 — bedroom-20 (the reference's only published accuracy anchor,
README.md:115-117): IndoorLidar "bedroom" frames 0..20, bilateral filter ON,
MsIcpParams defaults -> mean trajectory error must be <= angle 1.91 deg,
translation 0.03885.

Gate 2 — TUM fr1/desk end-to-end (BASELINE config 2): the TUM loader's
timestamp association + intrinsics drive the full pipeline; no published
reference number exists, so the gate is a sanity bound on a fast-moving
handheld sequence rather than a parity figure.
"""

import math
import os

import pytest

DATA_DIR = os.environ.get("ALIGN3D_DATASETS_DIR", "datasets")
BEDROOM = os.path.join(DATA_DIR, "indoor_lidar", "bedroom")
TUM_DESK = os.path.join(DATA_DIR, "tum", "rgbd_dataset_freiburg1_desk")


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.isdir(BEDROOM),
    reason=f"{BEDROOM} not present — run `python tools/fetch_datasets.py bedroom`",
)
def test_bedroom20_published_bound():
    from align3d_tpu.io.datasets.core import SubsetDataset
    from align3d_tpu.io.datasets.indoor_lidar import IndoorLidarDataset
    from align3d_tpu.odometry import run_odometry
    from align3d_tpu.ops.bilateral import BilateralFilter
    from align3d_tpu.range_image import RangeImageBuilder

    ds = SubsetDataset(IndoorLidarDataset.load(BEDROOM), list(range(20)))
    builder = RangeImageBuilder(bilateral_filter=BilateralFilter())
    result = run_odometry(ds, range_builder=builder)
    assert result.metrics is not None
    angle_deg = math.degrees(float(result.metrics.angle))
    trans = float(result.metrics.translation)
    print(f"bedroom-20: angle {angle_deg:.3f} deg, translation {trans:.5f}")
    assert angle_deg <= 1.91, f"angle {angle_deg:.3f} > published 1.91"
    assert trans <= 0.03885, f"translation {trans:.5f} > published 0.03885"


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.isdir(TUM_DESK),
    reason=f"{TUM_DESK} not present — run `python tools/fetch_datasets.py tum_fr1_desk`",
)
def test_tum_fr1_desk_end_to_end():
    from align3d_tpu.io.datasets.core import SubsetDataset
    from align3d_tpu.io.datasets.tum import TumRgbdDataset
    from align3d_tpu.odometry import run_odometry
    from align3d_tpu.ops.bilateral import BilateralFilter
    from align3d_tpu.range_image import RangeImageBuilder

    from align3d_tpu.metrics import rpe

    ds = SubsetDataset(TumRgbdDataset.load(TUM_DESK), list(range(40)))
    builder = RangeImageBuilder(bilateral_filter=BilateralFilter())
    result = run_odometry(ds, range_builder=builder)
    assert result.metrics is not None
    angle_deg = math.degrees(float(result.metrics.angle))
    trans = float(result.metrics.translation)
    print(f"tum fr1/desk 40: angle {angle_deg:.3f} deg, translation {trans:.5f}")
    assert math.isfinite(angle_deg) and math.isfinite(trans)

    # Drift-rate bound, not a truism: per-frame relative pose error vs the
    # motion-capture GT. fr1 runs at 30 Hz with fast handheld motion; a
    # correct frame-to-frame pipeline lands well under 1 deg / 1 cm RMSE per
    # frame, while a broken timestamp association or intrinsics mix-up blows
    # both by an order of magnitude. (TUM benchmark's own RPE definition;
    # drift compounding is what the loose <10 deg absolute bound missed.)
    gt = ds.trajectory().first_frame_at_origin()
    rot_rmse, t_rmse = rpe(result.trajectory, gt, delta=1)
    rot_deg = math.degrees(float(rot_rmse))
    print(f"tum fr1/desk 40: RPE/frame {rot_deg:.3f} deg, {float(t_rmse):.4f} m")
    assert rot_deg < 1.0, f"per-frame rotation RPE {rot_deg:.3f} deg >= 1.0"
    assert float(t_rmse) < 0.01, f"per-frame translation RPE {float(t_rmse):.4f} >= 1 cm"
