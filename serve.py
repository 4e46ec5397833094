#!/usr/bin/env python3
"""Serving daemon: batched HTTP mask serving on the fused TPU path.

Beyond the reference (which only ships the one-shot inference.py CLI):
concurrent requests micro-batch into ONE statically-shaped device program
(pytorch_segmentation_tpu/serving.py — TPU serving throughput is
batch-driven, PERF.md). Composes with --int8 PTQ, --ema weights and
flip/multi-scale TTA.

    python serve.py --model deeplabv3plus --weights weights/best.ckpt \
        -s 513 513 -nc 21 --port 8500 --max-batch 8
    curl -s -X POST --data-binary @img.jpg localhost:8500/predict > mask.png
    curl -s localhost:8500/healthz
"""

import argparse

from pytorch_segmentation_tpu.models import MODEL_REGISTRY


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="deeplabv3plus",
                        choices=sorted(MODEL_REGISTRY))
    parser.add_argument("-s", "--img_size", type=int, nargs=2,
                        default=[513, 513], metavar=("W", "H"))
    parser.add_argument("-nc", "--num-classes", type=int, default=21)
    parser.add_argument("--weights", type=str, default="weights/best.ckpt")
    parser.add_argument("--variant", type=str, default="",
                        help="model size variant (segformer: b0..b5; "
                             "fpn: r50/r34); must match the checkpoint")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8500)
    parser.add_argument("--max-batch", type=int, default=8,
                        help="static device batch (requests pad to it; "
                             "bigger = more throughput, more latency)")
    parser.add_argument("--batch-window-ms", type=float, default=5.0,
                        help="how long to wait coalescing concurrent "
                             "requests into one batch")
    parser.add_argument("--legacy-preproc", action="store_true")
    parser.add_argument("--int8", action="store_true",
                        help="int8 PTQ forward (quant.py; calibrates on "
                             "the warmup batch unless --no-warmup)")
    parser.add_argument("--ema", action="store_true",
                        help="serve the EMA-averaged weights")
    parser.add_argument("--tta", action="store_true",
                        help="flip TTA (~2x cost per request)")
    parser.add_argument("--tta-scales", type=float, nargs="+", default=[],
                        metavar="S", help="multi-scale TTA")
    parser.add_argument("--moe", type=int, default=0, metavar="E",
                        help="mixture-of-experts FFNs (segformer; must "
                             "match the training --moe)")
    parser.add_argument("--moe-top-k", type=int, default=2, metavar="K")
    parser.add_argument("--scan-blocks", action="store_true",
                        help="consume a stacked-params checkpoint trained "
                             "with train.py --scan-blocks/--pp (segformer)")
    parser.add_argument("--dp", action="store_true",
                        help="data-parallel serving over every local "
                             "chip: params replicate, the padded batch "
                             "shards over a 'data' mesh (max-batch rounds "
                             "up to a multiple of the chip count)")
    opt = parser.parse_args()

    from pytorch_segmentation_tpu.utils.runtime import setup_runtime
    setup_runtime()
    from pytorch_segmentation_tpu.engine.checkpoint import load_model_bundle
    from pytorch_segmentation_tpu.models import build_model
    from pytorch_segmentation_tpu.serving import MaskServer

    from pytorch_segmentation_tpu.models import (apply_moe,
                                                 apply_scan_blocks,
                                                 variant_kwargs)
    model_kw = apply_scan_blocks(opt.model,
                                 variant_kwargs(opt.model, opt.variant),
                                 opt.scan_blocks)
    model_kw = apply_moe(opt.model, model_kw, opt.moe, opt.moe_top_k)
    model = build_model(opt.model, num_classes=opt.num_classes, **model_kw)
    bundle = load_model_bundle(model, opt.weights,
                               (opt.img_size[1], opt.img_size[0]),
                               use_ema=opt.ema)
    mesh = None
    if opt.dp:
        from pytorch_segmentation_tpu.parallel import make_mesh
        mesh = make_mesh()
    server = MaskServer(bundle, img_size=tuple(opt.img_size),
                        max_batch=opt.max_batch,
                        batch_window_ms=opt.batch_window_ms,
                        legacy_preproc=opt.legacy_preproc, int8=opt.int8,
                        tta_flip=opt.tta,
                        tta_scales=tuple(opt.tta_scales), mesh=mesh)
    host, port = server.start(opt.host, opt.port)[:2]
    print(f"serving {opt.model} ({opt.num_classes} classes, "
          f"{opt.img_size[0]}x{opt.img_size[1]}) on http://{host}:{port} "
          f"— POST /predict, GET /healthz", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
