"""Native C++ data kernels vs cv2 / numpy references."""

import cv2
import numpy as np
import pytest

from pytorch_segmentation_tpu._native import lib

pytestmark = pytest.mark.skipif(lib is None, reason="native lib unavailable")


def test_fill_polygon_matches_cv2(rng):
    for _ in range(8):
        n = int(rng.integers(3, 8))
        pts = rng.integers(2, 62, (n, 2)).astype(np.float32)
        ours = np.zeros((64, 64), dtype=np.uint8)
        lib.fill_polygon(ours, pts, 1)
        ref = np.zeros((64, 64), dtype=np.uint8)
        cv2.fillPoly(ref, [pts.astype(np.int32)], 1, 0)
        inter = np.logical_and(ours == 1, ref == 1).sum()
        union = np.logical_or(ours == 1, ref == 1).sum()
        # interiors agree; thin polygons differ only in boundary pixel
        # convention (cv2 8-connected Bresenham vs parametric lines)
        assert inter / max(union, 1) > 0.8, (pts, inter, union)
        a_ours, a_ref = (ours == 1).sum(), (ref == 1).sum()
        assert abs(int(a_ours) - int(a_ref)) <= 0.1 * max(a_ref, 10)


def test_map_colors_matches_numpy(rng):
    from pytorch_segmentation_tpu.data.colormap import (VOC_COLORMAP,
                                                        colorize_mask,
                                                        mask_from_colors)
    mask = rng.integers(0, 16, (40, 40)).astype(np.uint8)
    colored = colorize_mask(mask, VOC_COLORMAP)
    ours = lib.map_colors(colored, VOC_COLORMAP)
    ref = mask_from_colors(colored, VOC_COLORMAP)
    np.testing.assert_array_equal(ours, ref)


def test_resize_matches_cv2(rng):
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    ours = lib.resize_u8(img, (64, 96))
    ref = cv2.resize(img, (96, 64), interpolation=cv2.INTER_LINEAR)
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 1.0
    ours_n = lib.resize_u8(img, (64, 96), nearest=True)
    assert ours_n.shape == (64, 96, 3)
    mask = rng.integers(0, 3, (37, 53)).astype(np.uint8)
    out_mask = lib.resize_u8(mask, (17, 29), nearest=True)
    assert set(np.unique(out_mask)).issubset(set(np.unique(mask)))
