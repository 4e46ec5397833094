#!/usr/bin/env python3
"""Convert a VOC2012 tree into the data/voc layout (rebuild of reference
voc2dataset.py, fixing its bugs — SURVEY.md §2.2: `rm` on a directory,
`valid.txt` vs VOC's `val.txt` — and using portable python fs ops instead of
shelling out)."""

import argparse
import os
import os.path as osp
import shutil

import find_color_map


def voc2dataset(data_dir, out_dir="data/voc"):
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(osp.join(out_dir, "images"), exist_ok=True)
    os.makedirs(osp.join(out_dir, "labels"), exist_ok=True)

    seg_sets = osp.join(data_dir, "VOC2012/ImageSets/Segmentation")
    for split_src, split_dst in (("train.txt", "train.txt"),
                                 ("val.txt", "val.txt")):
        src = osp.join(seg_sets, split_src)
        if not osp.exists(src):  # tolerate the reference's 'valid.txt' layout
            alt = osp.join(seg_sets, "valid.txt")
            src = alt if osp.exists(alt) else src
        with open(src) as f:
            lines = [l for l in f.read().split("\n") if l]
        with open(osp.join(out_dir, split_dst), "w") as f:
            f.write("\n".join(l + ".jpg" for l in lines))

    for name in os.listdir(osp.join(data_dir, "VOC2012/JPEGImages")):
        shutil.copy(osp.join(data_dir, "VOC2012/JPEGImages", name),
                    osp.join(out_dir, "images", name))
    for name in os.listdir(osp.join(data_dir, "VOC2012/SegmentationClass")):
        shutil.copy(osp.join(data_dir, "VOC2012/SegmentationClass", name),
                    osp.join(out_dir, "labels", name))
    find_color_map.run(out_dir)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("data_dir")
    parser.add_argument("--out", default="data/voc")
    args = parser.parse_args()
    voc2dataset(args.data_dir, args.out)
