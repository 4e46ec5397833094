#!/usr/bin/env python3
"""Inference CLI (rebuild of reference inference.py): dir of images ->
color-mapped PNG masks. Batched on device (the reference ran batch=1);
`--legacy-preproc` reproduces the reference's /255 normalization mismatch
(SURVEY.md §2.2), the default uses the training normalization."""

import argparse
import os
import os.path as osp
import shutil

import cv2
import numpy as np
from tqdm import tqdm

from pytorch_segmentation_tpu.data import IMG_EXT, VOC_COLORMAP, colorize_mask
from pytorch_segmentation_tpu.engine.checkpoint import load_model_bundle
from pytorch_segmentation_tpu.inference import inference
from pytorch_segmentation_tpu.models import (MODEL_REGISTRY,
                                              build_model)


def run(img_dir, output_dir, img_size, num_classes, weights, model_name,
        legacy_preproc=False, batch_size=8, show=False, int8=False,
        calib=False, ema=False, tta=False, tile=None, tta_scales=(),
        variant="", scan_blocks=False, moe=0, moe_top_k=2):
    shutil.rmtree(output_dir, ignore_errors=True)
    os.makedirs(output_dir, exist_ok=True)
    from pytorch_segmentation_tpu.models import (apply_moe,
                                                 apply_scan_blocks,
                                                 variant_kwargs)
    model_kw = apply_scan_blocks(model_name,
                                 variant_kwargs(model_name, variant),
                                 scan_blocks)
    model_kw = apply_moe(model_name, model_kw, moe, moe_top_k)
    model = build_model(model_name, num_classes=num_classes, **model_kw)
    bundle = load_model_bundle(model, weights, (img_size[1], img_size[0]),
                               use_ema=ema)
    if tile is not None:
        # sliding-window serving at each image's NATIVE resolution (no
        # downscale round-trip); tile size = the training resolution.
        # One image at a time: native shapes vary (one compile per shape).
        from pytorch_segmentation_tpu.inference import make_tiled_mask_fn
        tiled = make_tiled_mask_fn(bundle, tile_hw=(tile[1], tile[0]),
                                   legacy_preproc=legacy_preproc,
                                   tta_flip=tta, tta_scales=tta_scales)
        names = sorted(n for n in os.listdir(img_dir)
                       if osp.splitext(n)[1] in IMG_EXT)
        for name in tqdm(names):
            img = cv2.imread(osp.join(img_dir, name))
            segmap = np.asarray(tiled(img[None, :, :, ::-1]))[0]
            seg = colorize_mask(segmap, VOC_COLORMAP)
            cv2.imwrite(osp.join(output_dir, osp.splitext(name)[0] + ".png"),
                        seg)
        return

    names = sorted(n for n in os.listdir(img_dir)
                   if osp.splitext(n)[1] in IMG_EXT)
    quant_stats = None
    if int8 and calib and names:
        # calibrate the activation scales once on the first batch, reuse
        # for the whole run (the calibrated int8 program skips the
        # per-layer abs-max reductions the dynamic mode pays)
        from pytorch_segmentation_tpu.quant import calibrate_from_u8
        imgs = [cv2.imread(osp.join(img_dir, n))
                for n in names[:batch_size]]
        first = np.stack([
            cv2.resize(img, tuple(img_size))[:, :, ::-1] for img in imgs
        ]).astype(np.uint8)
        quant_stats = calibrate_from_u8(bundle, first, legacy_preproc)
    for start in tqdm(range(0, len(names), batch_size)):
        chunk = names[start:start + batch_size]
        imgs = [cv2.imread(osp.join(img_dir, n)) for n in chunk]
        segmaps = inference(bundle, imgs, img_size,
                            legacy_preproc=legacy_preproc, int8=int8,
                            quant_stats=quant_stats, tta_flip=tta,
                            tta_scales=tta_scales)
        for name, img, segmap in zip(chunk, imgs, segmaps):
            seg = colorize_mask(segmap, VOC_COLORMAP)
            cv2.imwrite(osp.join(output_dir, osp.splitext(name)[0] + ".png"),
                        seg)
            if show:
                # the reference parses --show but never acts on it
                # (inference.py:17,48 — `show` is dead); here it displays a
                # half-blend of image and colorized mask per result.
                overlay = cv2.addWeighted(img, 0.5, seg, 0.5, 0.0)
                try:
                    cv2.imshow("pseg", overlay)
                    cv2.waitKey(0)
                except cv2.error:  # headless build / no display
                    print(f"--show: no display available; wrote "
                          f"{osp.join(output_dir, name)}")
                    show = False


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("img_dir", type=str)
    parser.add_argument("output_dir", type=str)
    parser.add_argument("--model", type=str, default="deeplabv3plus",
                        choices=sorted(MODEL_REGISTRY))
    parser.add_argument("-s", "--img_size", type=int, nargs=2,
                        default=[320, 320])
    parser.add_argument("-nc", "--num-classes", type=int, default=2)
    parser.add_argument("--weights", type=str, default="weights/best.ckpt")
    parser.add_argument("-bs", "--batch-size", type=int, default=8)
    parser.add_argument("--variant", type=str, default="",
                        help="model size variant (segformer: b0..b5; fpn: "
                             "r50/r34); must match the checkpoint")
    parser.add_argument("--legacy-preproc", action="store_true",
                        help="reproduce the reference's /255 inference "
                             "normalization instead of the training contract")
    parser.add_argument("--show", action="store_true", help="display results")
    parser.add_argument("--int8", action="store_true",
                        help="int8 PTQ forward (dynamic activation scales; "
                             "~1.4x on MXU-bound convs on TPU v5e)")
    parser.add_argument("--calib", action="store_true",
                        help="with --int8: calibrate activation scales on "
                             "the first batch and run the CALIBRATED int8 "
                             "program for the whole directory (faster than "
                             "dynamic scales — PERF.md)")
    parser.add_argument("--ema", action="store_true",
                        help="serve the EMA-averaged weights stored by "
                             "train.py --ema")
    parser.add_argument("--tta", action="store_true",
                        help="flip test-time augmentation (~2x cost)")
    parser.add_argument("--tta-scales", type=float, nargs="+", default=[],
                        metavar="S",
                        help="multi-scale TTA, e.g. 0.75 1.0 1.25 "
                             "(composes with --tta and --tile)")
    parser.add_argument("--scan-blocks", action="store_true",
                        help="consume a stacked-params checkpoint trained "
                             "with train.py --scan-blocks/--pp (segformer)")
    parser.add_argument("--moe", type=int, default=0, metavar="E",
                        help="mixture-of-experts FFNs (segformer; must "
                             "match the training --moe)")
    parser.add_argument("--moe-top-k", type=int, default=2, metavar="K")
    parser.add_argument("--tile", type=int, nargs=2, default=None,
                        metavar=("W", "H"),
                        help="sliding-window inference at each image's "
                             "native resolution with WxH tiles (use the "
                             "training size) instead of downscaling to "
                             "--img_size")
    opt = parser.parse_args()
    print(opt)

    from pytorch_segmentation_tpu.utils.runtime import setup_runtime
    setup_runtime()
    run(opt.img_dir, opt.output_dir, opt.img_size, opt.num_classes,
        opt.weights, opt.model, opt.legacy_preproc, opt.batch_size,
        show=opt.show, int8=opt.int8, calib=opt.calib, ema=opt.ema,
        tta=opt.tta, tile=opt.tile, tta_scales=tuple(opt.tta_scales),
        variant=opt.variant, scan_blocks=opt.scan_blocks, moe=opt.moe,
        moe_top_k=opt.moe_top_k)
