"""RGB-D dataset loaders (reference ``src/io/dataset/``)."""

from align3d_tpu.io.datasets.core import RgbdDataset, SubsetDataset, DatasetError
from align3d_tpu.io.datasets.slamtb import SlamTbDataset
from align3d_tpu.io.datasets.tum import TumRgbdDataset
from align3d_tpu.io.datasets.indoor_lidar import IndoorLidarDataset

__all__ = [
    "RgbdDataset",
    "SubsetDataset",
    "DatasetError",
    "SlamTbDataset",
    "TumRgbdDataset",
    "IndoorLidarDataset",
    "load_dataset",
]


def load_dataset(fmt: str, path: str) -> RgbdDataset:
    """Format dispatcher (reference ``examples/src/lib.rs:6``)."""
    if fmt == "ilrgbd":
        return IndoorLidarDataset.load(path)
    if fmt == "tum":
        return TumRgbdDataset.load(path)
    if fmt == "slamtb":
        return SlamTbDataset.load(path)
    raise ValueError(f"Invalid dataset format: {fmt}")
