#!/usr/bin/env python3
"""Scan labels/*.png for unique colors -> classes.names (rebuild of reference
find_color_map.py, fixing its `% (*c)` SyntaxError at line 23 —
SURVEY.md §2.2)."""

import argparse
import os
import os.path as osp

import cv2
import numpy as np
from tqdm import tqdm

from pytorch_segmentation_tpu.data import IMG_EXT


def run(data_dir):
    # accumulate colors as packed 24-bit ints in a set: one pass per image,
    # no re-sorting of the running class list per file
    seen: set[int] = set()
    names = [n for n in os.listdir(osp.join(data_dir, "labels"))
             if osp.splitext(n)[1] in IMG_EXT]
    for name in tqdm(names):
        bgr = cv2.imread(osp.join(data_dir, "labels", name)).reshape(-1, 3)
        # B in the high bits so sorted packed order == row-lexicographic
        # (B, G, R) order, the class-id order the reference produced
        packed = ((bgr[:, 0].astype(np.int64) << 16)
                  | (bgr[:, 1].astype(np.int64) << 8)
                  | bgr[:, 2].astype(np.int64))
        seen.update(np.unique(packed).tolist())
    classes = np.array([[(p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF]
                        for p in sorted(seen)], dtype=np.int64)
    output = "\n".join("%d, %d, %d" % tuple(c) for c in classes)
    with open(osp.join(data_dir, "classes.names"), "w") as f:
        f.write(output)
    return classes


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("data_dir")
    args = parser.parse_args()
    run(args.data_dir)
