"""Native C++ loader vs PIL decode parity + prefetch pipeline."""

import numpy as np
import pytest

from align3d_tpu import config
from align3d_tpu.io import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built"
)


def _sample_paths():
    if not config.has_ref_data():
        pytest.skip("reference fixture data not available")
    import json
    import os

    root = config.ref_data_path("rgbd", "sample1")
    frames = json.load(open(os.path.join(root, "frames.json")))["root"]
    colors = [os.path.join(root, fr["rgb_image"]) for fr in frames]
    depths = [os.path.join(root, fr["depth_image"]) for fr in frames]
    return colors, depths


def test_decode_matches_pil():
    from PIL import Image

    colors, depths = _sample_paths()
    rgb = native_loader.decode_rgb(colors[0])
    pil_rgb = np.asarray(Image.open(colors[0]).convert("RGB"))
    assert rgb.shape == pil_rgb.shape
    if colors[0].lower().endswith(".png"):
        np.testing.assert_array_equal(rgb, pil_rgb)
    else:
        # JPEG decoders may differ by DCT implementation: stay close.
        assert np.mean(np.abs(rgb.astype(int) - pil_rgb.astype(int))) < 2.0

    d = native_loader.decode_depth(depths[0])
    pil_d = np.asarray(Image.open(depths[0]))
    np.testing.assert_array_equal(d, pil_d.astype(np.uint16))


def test_prefetch_loader_sequential():
    colors, depths = _sample_paths()
    loader = native_loader.PrefetchLoader(colors[:6], depths[:6], n_threads=2)
    try:
        for i in range(6):
            color, depth = loader.get(i)
            assert color.ndim == 3 and color.shape[2] == 3
            assert depth.dtype == np.uint16
            assert depth.max() > 0
    finally:
        loader.close()


def test_prefetch_matches_single_shot():
    colors, depths = _sample_paths()
    loader = native_loader.PrefetchLoader(colors[:2], depths[:2])
    try:
        c0, d0 = loader.get(0)
    finally:
        loader.close()
    np.testing.assert_array_equal(c0, native_loader.decode_rgb(colors[0]))
    np.testing.assert_array_equal(d0, native_loader.decode_depth(depths[0]))


def test_prefetching_dataset_matches_plain():
    from align3d_tpu import config
    from align3d_tpu.io.datasets import SlamTbDataset
    from align3d_tpu.io.datasets.core import maybe_prefetch

    if not config.has_ref_data():
        pytest.skip("reference fixture data not available")
    plain = SlamTbDataset.load(config.ref_data_path("rgbd", "sample1"))
    pre = maybe_prefetch(plain)
    assert pre is not plain  # wrapper engaged
    try:
        for i in (0, 1, 2):
            a = plain.get(i)
            b = pre.get(i)
            np.testing.assert_array_equal(
                np.asarray(a.image.depth), np.asarray(b.image.depth)
            )
            np.testing.assert_array_equal(
                np.asarray(a.image.color), np.asarray(b.image.color)
            )
            assert a.image.depth_scale == b.image.depth_scale
    finally:
        pre.close()
