#!/usr/bin/env python3
"""Convert a SegFormer checkpoint between the unrolled block layout
(backbone/block{i}_{j}, the default) and the stacked scan_blocks layout
(backbone/blocks{i}/stack, used by train.py --scan-blocks / --pp).

    python tools/convert_ckpt_layout.py best.ckpt best_stacked.ckpt \
        --variant b3 --to stacked
    python tools/convert_ckpt_layout.py best_stacked.ckpt best.ckpt \
        --variant b3 --to unrolled

Converts params and EMA params; batch_stats pass through (transformer
blocks are LayerNorm-only, their stats live outside the stacks). The
optimizer state is DROPPED — its momentum tree mirrors the param layout,
so a converted checkpoint warm-starts training but does not resume an
optimizer trajectory across layouts.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def convert(src: str, dst: str, variant: str, to: str) -> None:
    from pytorch_segmentation_tpu.engine.checkpoint import (load_checkpoint,
                                                            save_checkpoint)
    from pytorch_segmentation_tpu.models.segformer import (
        stack_block_params, unstack_block_params)

    fn = stack_block_params if to == "stacked" else unstack_block_params
    ckpt = load_checkpoint(src)
    params = fn(ckpt["model"], variant)
    ema = fn(ckpt["ema"], variant) if ckpt.get("ema") is not None else None
    if ckpt.get("opt_state") is not None:
        print("note: optimizer state dropped (layout-specific); the "
              "converted checkpoint warm-starts but does not --resume")
    save_checkpoint(dst, params, ckpt["batch_stats"], opt_state=None,
                    epoch=ckpt.get("epoch", 0),
                    best_miou=ckpt.get("best_miou", 0.0), ema=ema)
    print(f"wrote {dst} ({to} layout, variant {variant})")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--variant", required=True,
                   help="segformer variant of the checkpoint (b0..b5)")
    p.add_argument("--to", choices=("stacked", "unrolled"), required=True)
    a = p.parse_args()
    convert(a.src, a.dst, a.variant, a.to)
