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
    classes = np.zeros([0, 3], dtype=np.int64)
    names = [n for n in os.listdir(osp.join(data_dir, "labels"))
             if osp.splitext(n)[1] in IMG_EXT]
    for name in tqdm(names):
        img = cv2.imread(osp.join(data_dir, "labels", name)).reshape(-1, 3)
        classes = np.unique(
            np.concatenate([classes, np.unique(img, axis=0)], 0), axis=0)
    output = "\n".join("%d, %d, %d" % tuple(c) for c in classes)
    with open(osp.join(data_dir, "classes.names"), "w") as f:
        f.write(output)
    return classes


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("data_dir")
    args = parser.parse_args()
    run(args.data_dir)
