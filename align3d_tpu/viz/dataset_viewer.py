"""One-shot dataset preview renders for the CLI ``viewer`` subcommand."""

from __future__ import annotations

import numpy as np

from align3d_tpu.viz.viewers import RgbdDatasetViewer


def render_dataset_preview(
    fmt: str,
    path: str,
    output: str,
    max_frames: int | None = None,
    width: int = 640,
    height: int = 480,
) -> str:
    """Load a dataset, pose every frame's point cloud by its trajectory, and
    render a single fitted view to ``output`` (PNG)."""
    from align3d_tpu.io.datasets import load_dataset

    dataset = load_dataset(fmt, path)
    viewer = RgbdDatasetViewer(dataset, width=width, height=height)
    viewer.build_scene(max_frames=max_frames, stride=1)
    img = viewer.viewer.render_frame()
    img.save_png(output)
    return output
