"""Utilities: profiling, logging."""

from align3d_tpu.utils.profiling import StageTimer, trace

__all__ = ["StageTimer", "trace"]
