"""Host-side I/O: mesh/point-cloud files and RGB-D dataset loaders."""

from align3d_tpu.io.geometry import Geometry
from align3d_tpu.io.ply import read_ply, write_ply
from align3d_tpu.io.off import read_off

__all__ = ["Geometry", "read_ply", "write_ply", "read_off"]
