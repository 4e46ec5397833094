#!/usr/bin/env python3
"""Split a COCO-format coco.json into train.json / val.json.

The reference's data tutorial (reference README.md "Create custom data")
tells users to produce train.json/val.json from a single coco.json with
`split_coco_json.py` from the external woodsgao/cv_utils repo; this is the
in-tree equivalent so the documented workflow is self-contained. Images
are shuffled deterministically (--seed) and split by --ratio; annotations
follow their image.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import random


def split_coco_json(path: str, ratio: float = 0.9, seed: int = 0,
                    out_dir: str | None = None):
    with open(path) as f:
        coco = json.load(f)
    images = list(coco.get("images", []))
    rng = random.Random(seed)
    rng.shuffle(images)
    n_train = int(round(len(images) * ratio))
    n_train = min(max(n_train, 1), max(len(images) - 1, 1))
    splits = {"train": images[:n_train], "val": images[n_train:]}
    by_image: dict = {}
    for ann in coco.get("annotations", []):
        by_image.setdefault(ann["image_id"], []).append(ann)
    out_dir = out_dir or osp.dirname(osp.abspath(path))
    outs = []
    for name, imgs in splits.items():
        ids = {im["id"] for im in imgs}
        out = {
            "images": imgs,
            "annotations": [a for i in ids for a in by_image.get(i, [])],
            "categories": coco.get("categories", []),
        }
        out_path = osp.join(out_dir, f"{name}.json")
        with open(out_path, "w") as f:
            json.dump(out, f)
        outs.append(out_path)
        print(f"{name}: {len(imgs)} images, {len(out['annotations'])} "
              f"annotations -> {out_path}")
    return outs


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("json_path", type=str,
                        help="coco.json to split (train/val written next to "
                             "it unless --out-dir)")
    parser.add_argument("--ratio", type=float, default=0.9,
                        help="train fraction (default 0.9)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out-dir", type=str, default=None)
    opt = parser.parse_args()
    split_coco_json(opt.json_path, opt.ratio, opt.seed, opt.out_dir)
