#!/usr/bin/env python3
"""Pseudo-labeling for self-training: run a trained model over a directory
of UNLABELED images and write a ready-to-train `segimg` dataset
(voc2dataset.py layout: classes.names + images/ + labels/*.png color masks
+ train.txt).

Usage:
    python tools/pseudo_label.py IMG_DIR OUT_DIR --model deeplabv3plus \
        --weights weights/best.ckpt -s 513 513 -nc 21 \
        [--threshold 0.9] [--min-keep 0.25] [--classes classes.names] \
        [--variant V] [--ema] [--tta] [-bs 8]

Then self-train (Xie et al. 2020 "Noisy Student" / the standard
semi-supervised segmentation recipe — mix with the labeled set or
fine-tune):
    python train.py OUT_DIR --dataset segimg --model ... --weights TEACHER

Confidence handling: per pixel, the teacher's softmax max-probability must
reach --threshold; everything below is labeled class 0 (background) — the
`segimg` pipeline has no ignore index (reference CE semantics,
utils/utils.py:17-24), and background is the conservative default for VOC-
style data where class 0 dominates. Images whose confident-pixel fraction
is below --min-keep are skipped entirely (they would inject mostly-noise
labels). Everything runs on device through the same jitted
normalize->forward->softmax program as inference.py (make_infer_fn);
probabilities resize to each image's native size on the host exactly like
the reference inference contract (utils/inference.py:8-21).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil


def main():
    ap = argparse.ArgumentParser(
        description="write a segimg pseudo-label dataset from a teacher")
    ap.add_argument("img_dir", help="directory of unlabeled images")
    ap.add_argument("out_dir", help="output dataset directory")
    ap.add_argument("--model", type=str, required=True)
    ap.add_argument("--weights", type=str, required=True)
    ap.add_argument("-s", "--img-size", type=int, nargs=2, required=True,
                    metavar=("W", "H"), help="network input size")
    ap.add_argument("-nc", "--num-classes", type=int, required=True)
    ap.add_argument("--variant", type=str, default="")
    ap.add_argument("-bs", "--batch-size", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.9,
                    help="per-pixel confidence floor; below -> class 0")
    ap.add_argument("--min-keep", type=float, default=0.25,
                    help="skip images with < this fraction of confident "
                         "pixels")
    ap.add_argument("--classes", type=str, default="",
                    help="classes.names file to copy (default: class_<i> "
                         "placeholders)")
    ap.add_argument("--ema", action="store_true",
                    help="serve the EMA weights from the checkpoint")
    ap.add_argument("--tta", action="store_true", help="flip TTA")
    ap.add_argument("--tta-scales", type=float, nargs="*", default=[],
                    help="multi-scale TTA scales (e.g. 0.75 1.25)")
    opt = ap.parse_args()

    from pytorch_segmentation_tpu.utils.runtime import setup_runtime
    setup_runtime()

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from pytorch_segmentation_tpu.data.colormap import (VOC_COLORMAP,
                                                        colorize_mask)
    from pytorch_segmentation_tpu.data.datasets import IMG_EXT
    from pytorch_segmentation_tpu.engine.checkpoint import load_model_bundle
    from pytorch_segmentation_tpu.inference import make_infer_fn
    from pytorch_segmentation_tpu.models import (build_model,
                                                 variant_kwargs)

    names = sorted(n for n in os.listdir(opt.img_dir)
                   if osp.splitext(n)[1].lower() in IMG_EXT)
    if not names:
        raise SystemExit(f"no images ({'/'.join(sorted(IMG_EXT))}) "
                         f"in {opt.img_dir}")

    model = build_model(opt.model, num_classes=opt.num_classes,
                        dtype=jnp.bfloat16,
                        **variant_kwargs(opt.model, opt.variant))
    w, h = opt.img_size
    bundle = load_model_bundle(model, opt.weights, (h, w), use_ema=opt.ema)
    infer = make_infer_fn(bundle, tta_flip=opt.tta,
                          tta_scales=tuple(opt.tta_scales))

    os.makedirs(osp.join(opt.out_dir, "images"), exist_ok=True)
    os.makedirs(osp.join(opt.out_dir, "labels"), exist_ok=True)
    if opt.classes:
        shutil.copyfile(opt.classes, osp.join(opt.out_dir, "classes.names"))
    else:
        with open(osp.join(opt.out_dir, "classes.names"), "w") as f:
            f.write("\n".join(f"class_{i}"
                              for i in range(opt.num_classes)) + "\n")

    kept, skipped = [], 0
    for i in range(0, len(names), opt.batch_size):
        chunk = names[i:i + opt.batch_size]
        imgs = [cv2.imread(osp.join(opt.img_dir, n)) for n in chunk]
        chunk = [n for n, im in zip(chunk, imgs) if im is not None]
        imgs = [im for im in imgs if im is not None]
        if not imgs:
            continue
        batch = np.stack([cv2.resize(im, (w, h))[:, :, ::-1]
                          for im in imgs]).astype(np.uint8)
        probs = np.asarray(infer(batch))  # [B, h, w, C] f32
        for name, img, p in zip(chunk, imgs, probs):
            # reference inference contract: probabilities to native size
            p = cv2.resize(p, (img.shape[1], img.shape[0]))
            if p.ndim == 2:  # cv2 drops a size-1 channel axis
                p = p[:, :, None]
            conf = p.max(axis=2)
            mask = p.argmax(axis=2).astype(np.int32)
            keep = conf >= opt.threshold
            frac = float(keep.mean())
            if frac < opt.min_keep:
                skipped += 1
                continue
            mask[~keep] = 0  # below-confidence -> background (see module doc)
            shutil.copyfile(osp.join(opt.img_dir, name),
                            osp.join(opt.out_dir, "images", name))
            color = colorize_mask(mask, VOC_COLORMAP)
            cv2.imwrite(osp.join(opt.out_dir, "labels",
                                 osp.splitext(name)[0] + ".png"), color)
            kept.append((name, frac))

    with open(osp.join(opt.out_dir, "train.txt"), "w") as f:
        f.write("\n".join(n for n, _ in kept) + ("\n" if kept else ""))
    if kept:
        mean_frac = sum(f for _, f in kept) / len(kept)
        print(f"pseudo-labeled {len(kept)}/{len(names)} images "
              f"({skipped} below --min-keep {opt.min_keep}); mean "
              f"confident fraction {mean_frac:.3f} at threshold "
              f"{opt.threshold}")
        print(f"self-train with: python train.py {opt.out_dir} "
              f"--dataset segimg --model {opt.model} -nc handled-by-"
              f"classes.names --weights {opt.weights}")
    else:
        print(f"kept 0/{len(names)} images — lower --threshold/"
              f"--min-keep or check the teacher")


if __name__ == "__main__":
    main()
