#!/usr/bin/env python3
"""Export CLI (rebuild of reference export2caffe.py): checkpoint ->
conv-BN-fused StableHLO artifact.

Fixes the reference's model/artifact-name mismatch (it builds UNet but names
the artifact 'DeepLabV3Plus', export2caffe.py:13-18 — SURVEY.md §2.2) by
taking the model from `--model` and naming the artifact accordingly."""

import argparse

from pytorch_segmentation_tpu.engine.checkpoint import load_model_bundle
from pytorch_segmentation_tpu.export import export_stablehlo, fuse_conv_bn
from pytorch_segmentation_tpu.models import (MODEL_REGISTRY,
                                              build_model)


def export(weights, model_name, num_classes, img_size, out=None,
           variant="", scan_blocks=False, moe=0, moe_top_k=2):
    from pytorch_segmentation_tpu.models import (apply_moe,
                                                 apply_scan_blocks,
                                                 variant_kwargs)
    model_kw = apply_scan_blocks(model_name,
                                 variant_kwargs(model_name, variant),
                                 scan_blocks)
    model_kw = apply_moe(model_name, model_kw, moe, moe_top_k)
    model = build_model(model_name, num_classes=num_classes, **model_kw)
    bundle = load_model_bundle(model, weights, (img_size[1], img_size[0]))
    params, batch_stats = fuse_conv_bn(bundle.params, bundle.batch_stats)
    out = out or f"{model_name}.stablehlo"
    blob, _ = export_stablehlo(model, params, batch_stats,
                               (img_size[1], img_size[0]), path=out)
    print(f"wrote {out} ({len(blob)} bytes)")
    return out


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("weights", type=str)
    parser.add_argument("--model", type=str, default="unet",
                        choices=sorted(MODEL_REGISTRY))
    parser.add_argument("-s", "--img_size", type=int, nargs=2,
                        default=[320, 320])
    parser.add_argument("-nc", "--num-classes", type=int, default=2)
    parser.add_argument("-o", "--out", type=str, default="")
    parser.add_argument("--variant", type=str, default="",
                        help="model size variant (segformer: b0..b5; "
                             "fpn: r50/r34); must match the checkpoint")
    parser.add_argument("--scan-blocks", action="store_true",
                        help="consume a stacked-params checkpoint trained "
                             "with train.py --scan-blocks/--pp (segformer)")
    parser.add_argument("--moe", type=int, default=0, metavar="E",
                        help="mixture-of-experts FFNs (segformer; must "
                             "match the training --moe)")
    parser.add_argument("--moe-top-k", type=int, default=2, metavar="K")
    opt = parser.parse_args()

    from pytorch_segmentation_tpu.utils.runtime import setup_runtime
    setup_runtime()
    export(opt.weights, opt.model, opt.num_classes, opt.img_size,
           opt.out or None, variant=opt.variant,
           scan_blocks=opt.scan_blocks, moe=opt.moe,
           moe_top_k=opt.moe_top_k)
