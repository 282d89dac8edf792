from align3d_tpu.icp.params import IcpParams, MsIcpParams
from align3d_tpu.icp.image_icp import ImageIcp
from align3d_tpu.icp.multiscale import MultiscaleAlign
from align3d_tpu.icp.pcl_icp import Icp

__all__ = ["IcpParams", "MsIcpParams", "ImageIcp", "MultiscaleAlign", "Icp"]
