"""Batch visualizer (reference utils/utils.py:27-48): denormalize the first 8
images, colorize predictions via VOC_COLORMAP, stack batch vertically with
image|mask side by side, write batch.png (BGR via cv2)."""

from __future__ import annotations

import cv2
import numpy as np

from ..data.colormap import VOC_COLORMAP, colorize_mask
from ..data.datasets import IMAGENET_MEAN, IMAGENET_STD

__all__ = ["show_batch"]


def show_batch(images: np.ndarray, preds: np.ndarray,
               path: str = "batch.png", max_images: int = 8):
    """images: [B, H, W, 3] ImageNet-normalized float (NHWC); preds: [B, H, W]
    int class ids. Masks may be at a different resolution than images (the
    multi-scale path resizes images only) — masks are nearest-resized to the
    image size for display."""
    imgs = np.asarray(images[:max_images], dtype=np.float32)
    segs = np.asarray(preds[:max_images])
    imgs = imgs * IMAGENET_STD + IMAGENET_MEAN
    imgs = np.clip(imgs, 0, 255).astype(np.uint8)[..., ::-1]  # RGB -> BGR
    h, w = imgs.shape[1:3]
    colored = np.stack([
        cv2.resize(colorize_mask(s), (w, h), interpolation=cv2.INTER_NEAREST)
        for s in segs])
    imgs = imgs.reshape(-1, w, 3)
    colored = colored.reshape(-1, w, 3)
    canvas = np.concatenate([imgs, colored], axis=1)
    cv2.imwrite(path, canvas)
    return canvas
