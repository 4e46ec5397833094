"""VOC bit-twiddle color palette (reference: utils/datasets.py:128-146).

Kept in BGR order like the reference (its line 142 stores [b, g, r]) because
all mask PNG IO goes through cv2, which is BGR-native.
"""

from __future__ import annotations

import numpy as np

__all__ = ["voc_colormap", "VOC_COLORMAP", "colorize_mask", "mask_from_colors"]


def voc_colormap(n: int = 256) -> np.ndarray:
    """[n, 3] uint8 palette, BGR order."""
    cmap = np.zeros((n, 3), dtype=np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (b, g, r)
    return cmap


VOC_COLORMAP = voc_colormap(32)


def colorize_mask(mask: np.ndarray, colormap: np.ndarray = VOC_COLORMAP) -> np.ndarray:
    """Class-id mask [H, W] -> BGR color image [H, W, 3] (vectorized table
    lookup; replaces the reference's per-class Python loop, inference.py:31-33)."""
    mask = np.asarray(mask)
    n = len(colormap)
    safe = np.clip(mask, 0, n - 1).astype(np.int64)
    out = colormap[safe]
    out[mask >= n] = 0
    return out.astype(np.uint8)


def mask_from_colors(color_img: np.ndarray, colormap: np.ndarray) -> np.ndarray:
    """BGR color label image [H, W, 3] -> class-id mask [H, W] uint8
    (reference SegImgDataset.get_data, utils/datasets.py:249-257).
    Unmatched colors map to 0, matching the reference's zeros-init behavior.
    Uses the native C++ kernel when available (csrc/pseg_native.cpp)."""
    color_img = np.asarray(color_img, dtype=np.uint8)
    try:
        from .._native import lib as _native
    except Exception:
        _native = None
    if _native is not None:
        return _native.map_colors(color_img, np.asarray(colormap, np.uint8))
    mask = np.zeros(color_img.shape[:2], dtype=np.uint8)
    for ci, c in enumerate(colormap):
        mask[(color_img == c).all(axis=2)] = ci
    return mask
