"""Synthetic COCO-format dataset generator.

Produces the e2e-test / benchmark dataset described in SURVEY.md §4: small
images containing colored shapes (rectangles = class 1 'box', triangles =
class 2 'tri') with matching COCO polygon annotations, laid out exactly like
the datasets the reference's train.py consumes (train.json / val.json +
image files in the same directory)."""

from __future__ import annotations

import json
import os
import os.path as osp

import cv2
import numpy as np

__all__ = ["make_synthetic_coco"]


def _make_split(root, name, num_images, img_size, rng, num_cats):
    images = []
    annotations = []
    ann_id = 1
    for i in range(num_images):
        fname = f"{name}_{i:04d}.jpg"
        img = np.full((img_size, img_size, 3),
                      rng.integers(40, 216, size=3, dtype=np.int64),
                      dtype=np.uint8)
        img = (img + rng.normal(0, 8, img.shape)).clip(0, 255).astype(np.uint8)
        n_shapes = int(rng.integers(1, 3))
        for _ in range(n_shapes):
            cls = int(rng.integers(0, num_cats))  # even ids box, odd tri
            cx = int(rng.integers(img_size // 4, 3 * img_size // 4))
            cy = int(rng.integers(img_size // 4, 3 * img_size // 4))
            r = int(rng.integers(img_size // 8, img_size // 4))
            if cls % 2 == 0:
                poly = [cx - r, cy - r, cx + r, cy - r, cx + r, cy + r,
                        cx - r, cy + r]
            else:
                poly = [cx, cy - r, cx + r, cy + r, cx - r, cy + r]
            poly = [int(np.clip(v, 1, img_size - 2)) for v in poly]
            pts = np.asarray(poly, dtype=np.int32).reshape(-1, 2)
            color = (int(rng.integers(0, 255)), int(rng.integers(0, 255)),
                     int(rng.integers(0, 255)))
            cv2.fillPoly(img, [pts], color)
            xs, ys = pts[:, 0], pts[:, 1]
            annotations.append({
                "id": ann_id,
                "image_id": i,
                "category_id": cls,
                "segmentation": poly,
                "bbox": [int(xs.min()), int(ys.min()),
                         int(xs.max() - xs.min()), int(ys.max() - ys.min())],
                "area": float(cv2.contourArea(pts)),
                "iscrowd": 0,
            })
            ann_id += 1
        cv2.imwrite(osp.join(root, fname), img)
        images.append({"id": i, "file_name": fname,
                       "width": img_size, "height": img_size})
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": ([{"id": 0, "name": "box"}, {"id": 1, "name": "tri"}]
                       if num_cats == 2 else
                       [{"id": c, "name": f"cat{c}"}
                        for c in range(num_cats)]),
    }
    with open(osp.join(root, f"{name}.json"), "w") as f:
        json.dump(coco, f)


def make_synthetic_coco(root: str, num_train: int = 16, num_val: int = 8,
                        img_size: int = 96, seed: int = 0,
                        num_classes: int = 2):
    """num_classes = shape categories (the dataset adds background, so the
    model trains with num_classes+1 output channels — pass 80 for a
    COCO-81-shaped drive)."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    _make_split(root, "train", num_train, img_size, rng, num_classes)
    _make_split(root, "val", num_val, img_size, rng, num_classes)
    return root
