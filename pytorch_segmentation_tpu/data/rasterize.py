"""Polygon -> class-id mask rasterization (cv2.fillPoly equivalent,
reference: utils/datasets.py:295-303, 380-388).

Backend order:
  1. native C++ scanline rasterizer (csrc/rasterize.cpp via ctypes) — the
     framework's own implementation, OpenMP-parallel over scanlines;
  2. cv2.fillPoly (same library the reference uses);
  3. pure-numpy scanline fallback.

All backends implement even-odd scanline fill with the pixel-center
convention cv2 uses (a pixel is inside if its integer coordinate is covered).
"""

from __future__ import annotations

import numpy as np

try:
    from .._native import lib as _native_lib
except Exception:  # pragma: no cover - native lib optional
    _native_lib = None

try:
    import cv2 as _cv2
except Exception:  # pragma: no cover
    _cv2 = None

__all__ = ["fill_polygon", "rasterize_annotations"]


def _fill_polygon_numpy(mask: np.ndarray, points: np.ndarray, value: int) -> None:
    """Even-odd scanline fill, edits `mask` in place. points: [N, 2] (x, y)."""
    pts = points.astype(np.float64)
    h, w = mask.shape
    ys = pts[:, 1]
    y0 = max(int(np.floor(ys.min())), 0)
    y1 = min(int(np.ceil(ys.max())), h - 1)
    x = pts[:, 0]
    y = pts[:, 1]
    xn = np.roll(x, -1)
    yn = np.roll(y, -1)
    for row in range(y0, y1 + 1):
        # edges crossing scanline at pixel-center row
        cond = ((y <= row) & (yn > row)) | ((yn <= row) & (y > row))
        if not cond.any():
            continue
        xs = x[cond] + (row - y[cond]) * (xn[cond] - x[cond]) / (yn[cond] - y[cond])
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            a = int(np.ceil(xs[i]))
            b = int(np.floor(xs[i + 1]))
            a = max(a, 0)
            b = min(b, w - 1)
            if a <= b:
                mask[row, a:b + 1] = value
    # draw polygon boundary (cv2.fillPoly includes the outline)
    n = len(pts)
    for i in range(n):
        _draw_line(mask, pts[i], pts[(i + 1) % n], value)


def _draw_line(mask: np.ndarray, p0, p1, value: int) -> None:
    h, w = mask.shape
    x0, y0 = p0
    x1, y1 = p1
    steps = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    ts = np.linspace(0.0, 1.0, steps + 1)
    xs = np.round(x0 + ts * (x1 - x0)).astype(np.int64)
    ys = np.round(y0 + ts * (y1 - y0)).astype(np.int64)
    keep = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    mask[ys[keep], xs[keep]] = value


def fill_polygon(mask: np.ndarray, points: np.ndarray, value: int) -> np.ndarray:
    """Fill one polygon into `mask` (in place) with `value`. points: [N, 2] xy."""
    points = np.asarray(points).reshape(-1, 2)
    if len(points) < 3:
        return mask
    if _native_lib is not None:
        _native_lib.fill_polygon(mask, points.astype(np.float32), int(value))
        return mask
    if _cv2 is not None:
        _cv2.fillPoly(mask, [points.astype(np.int64).astype(np.int32)], int(value), 0)
        return mask
    _fill_polygon_numpy(mask, points, int(value))
    return mask


def rasterize_annotations(height: int, width: int, annotations) -> np.ndarray:
    """COCO annotations -> semantic mask (reference CocoDataset.get_data,
    utils/datasets.py:295-303): each ann's flattened segmentation points are
    filled with category_id + 1 (0 = background), in annotation order."""
    mask = np.zeros((height, width), dtype=np.uint8)
    for ann in annotations:
        points = np.asarray(ann["segmentation"], dtype=np.float64).reshape(-1, 2)
        # reference casts to int64 before filling
        fill_polygon(mask, np.floor(points + 0.0).astype(np.int64),
                     int(ann["category_id"]) + 1)
    return mask
