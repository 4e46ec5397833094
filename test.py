#!/usr/bin/env python3
"""Standalone evaluation CLI (rebuild of reference test.py:76-106).

Adds `--model` (the reference hard-codes DeepLabV3Plus here while train.py
defaults to UNet — SURVEY.md §2.2) and `--dataset` (the reference likewise
hard-codes CocoDataset at test.py:9; `segimg` evaluates the voc2dataset.py
layout — docs/MIOU_PARITY_RUNBOOK.md step 4)."""

import argparse

from pytorch_segmentation_tpu.data import (CocoDataset, DataLoader, Fetcher,
                                           IdImgDataset, PostFetch,
                                           SegImgDataset)
from pytorch_segmentation_tpu.engine import test
from pytorch_segmentation_tpu.engine.checkpoint import load_model_bundle
from pytorch_segmentation_tpu.models import (MODEL_REGISTRY,
                                              build_model)

DATASETS = {"coco": CocoDataset, "segimg": SegImgDataset,
            "idimg": IdImgDataset}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("val", type=str,
                        help="val.json (coco) or val.txt (segimg/idimg)")
    parser.add_argument("--ignore-index", type=int, default=None,
                        metavar="ID",
                        help="label id excluded from the loss and the "
                             "confusion counts (e.g. 255 for Cityscapes/"
                             "ADE20K-style --dataset idimg labels)")
    parser.add_argument("--dataset", type=str, default="coco",
                        choices=sorted(DATASETS))
    parser.add_argument("--model", type=str, default="deeplabv3plus",
                        choices=sorted(MODEL_REGISTRY))
    parser.add_argument("--weights", type=str, default="")
    parser.add_argument("--variant", type=str, default="",
                        help="model size variant (segformer: b0..b5; fpn: "
                             "r50/r34); must match the checkpoint")
    parser.add_argument("--moe", type=int, default=0, metavar="E",
                        help="mixture-of-experts FFNs (segformer; must "
                             "match the training --moe)")
    parser.add_argument("--moe-top-k", type=int, default=2, metavar="K")
    parser.add_argument("--rect", action="store_true")
    parser.add_argument("-s", "--img_size", type=int, nargs=2,
                        default=[320, 320])
    parser.add_argument("-bs", "--batch-size", type=int, default=32)
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--int8", action="store_true",
                        help="evaluate the int8 PTQ forward (quant.py) — "
                             "reports the mIoU a quantized serving "
                             "deployment would get")
    parser.add_argument("--calib-batches", type=int, default=0,
                        help="with --int8: calibrate activation scales on "
                             "this many val batches first and evaluate the "
                             "CALIBRATED mode (the recommended deployment "
                             "config — 1.24x serving vs 1.04x dynamic); "
                             "0 = dynamic per-batch scales")
    parser.add_argument("--ema", action="store_true",
                        help="evaluate the EMA-averaged weights stored by "
                             "train.py --ema")
    parser.add_argument("--tta", action="store_true",
                        help="flip test-time augmentation: average logits "
                             "with a horizontally-flipped second forward "
                             "(~2x eval cost)")
    parser.add_argument("--scan-blocks", action="store_true",
                        help="consume a stacked-params checkpoint trained "
                             "with train.py --scan-blocks/--pp (segformer)")
    parser.add_argument("--cache-images", action="store_true",
                        help="keep decoded+resized val records in RAM "
                             "across epochs/eval passes")
    parser.add_argument("--report", type=str, default="", metavar="FILE",
                        help="write the full per-class metric table (all "
                             "classes, not just the printed worst-5) + raw "
                             "confusion sums as JSON")
    parser.add_argument("--tile", type=int, nargs=2, default=None,
                        metavar=("W", "H"),
                        help="mmseg 'slide' evaluation: forward WxH "
                             "windows (use the training crop size) over "
                             "the eval resolution, averaging overlapping "
                             "logits — the standard protocol when -s "
                             "exceeds the training crop")
    parser.add_argument("--boundary-iou", type=float, nargs="?",
                        const=0.02, default=None, metavar="R",
                        help="also report Boundary IoU (Cheng et al. "
                             "2021): IoU of the width-R*diagonal inner "
                             "boundary bands of pred vs target per class "
                             "(default band ratio 0.02); adds a mean line "
                             "and per-class values in --report")
    parser.add_argument("--tile-overlap", type=float, default=1 / 3,
                        help="fraction of tile overlap for --tile "
                             "(mmseg stride=2/3-crop default)")
    parser.add_argument("--tta-scales", type=float, nargs="+", default=[],
                        metavar="S",
                        help="multi-scale TTA, e.g. 0.75 1.0 1.25: extra "
                             "forwards at /32-snapped scaled sizes, logits "
                             "resized back and averaged (composes with "
                             "--tta; each scale costs ~S^2 of a forward)")
    opt = parser.parse_args()

    from pytorch_segmentation_tpu.utils.runtime import setup_runtime
    setup_runtime()

    val_data = DATASETS[opt.dataset](opt.val, img_size=opt.img_size,
                                     augments=False, rect=opt.rect,
                                     cache_images=opt.cache_images)
    val_loader = DataLoader(val_data, batch_size=opt.batch_size,
                            num_workers=opt.num_workers)
    val_fetcher = Fetcher(val_loader, PostFetch())

    from pytorch_segmentation_tpu.models import (apply_moe,
                                                 apply_scan_blocks,
                                                 variant_kwargs)
    model_kw = apply_scan_blocks(opt.model,
                                 variant_kwargs(opt.model, opt.variant),
                                 opt.scan_blocks)
    model_kw = apply_moe(opt.model, model_kw, opt.moe, opt.moe_top_k)
    model = build_model(opt.model, num_classes=len(val_data.classes),
                        **model_kw)
    bundle = load_model_bundle(model, opt.weights,
                               (opt.img_size[1], opt.img_size[0]),
                               use_ema=opt.ema)
    quant_stats = None
    if opt.int8 and opt.calib_batches > 0:
        from pytorch_segmentation_tpu import quant
        calib = []
        for i, (images, _segs, _valid) in enumerate(val_fetcher):
            if i >= opt.calib_batches:
                break
            calib.append(images)  # fetcher output is already normalized
        quant_stats = quant.calibrate(
            bundle.module,
            {"params": bundle.params, "batch_stats": bundle.batch_stats},
            calib)
        print(f"calibrated int8 scales on {len(calib)} val batches")
    metrics = test(bundle, val_fetcher, int8=opt.int8,
                   quant_stats=quant_stats, tta_flip=opt.tta,
                   tta_scales=opt.tta_scales,
                   report_path=opt.report or None,
                   ignore_index=opt.ignore_index,
                   tile=(opt.tile[1], opt.tile[0]) if opt.tile else None,
                   tile_overlap=opt.tile_overlap,
                   boundary_ratio=opt.boundary_iou)
    print("metrics: %8g" % metrics)


if __name__ == "__main__":
    main()
