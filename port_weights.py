#!/usr/bin/env python3
"""Port torchvision ImageNet backbone weights into a framework checkpoint.

The reference gets pretrained encoders implicitly
(`mobilenet_v2(pretrained=True)` at models/unet.py:16,
`resnet50(pretrained=True)` at models/deeplabv3plus.py:17). This
environment has no network access, so the equivalent here is explicit: feed
a torchvision state_dict file (`.pth` from the zoo, or any state dict with
torchvision naming) and get a `weights/`-style checkpoint whose backbone
subtree is the ported weights and whose decoder stays at kaiming init —
ready for `train.py --weights`.

    python port_weights.py mobilenet_v2.pth --model unet -nc 21 \
        -o weights/unet_imagenet.ckpt
    python port_weights.py resnet50.pth --model deeplabv3plus -nc 21 \
        -o weights/dlv3p_imagenet.ckpt

SegFormer ports from the HuggingFace `transformers` zoo instead
(nvidia/mit-b0..b5 encoder checkpoints, or full
SegformerForSemanticSegmentation finetunes — the decode head ports too,
and the classifier only when the class count matches):

    python port_weights.py mit_b0.pth --model segformer --variant b0 \
        -nc 21 -o weights/segformer_imagenet.ckpt

The converters are numerically validated against torch-reconstructed
reference models in tests/test_model_golden_parity.py (<1e-3 max-abs at
320x320 through the full forward).

`--reverse` ports the other way (migration back to torch): a framework
checkpoint becomes a torch-loadable `{'model': state_dict}` .pt (the
reference checkpoint format, test.py:103-104) with name-mirrored modules,
OIHW conv kernels and running BN stats — loadable with strict=True into a
torch reimplementation of the same architecture (tests/torch_refs.py):

    python port_weights.py weights/best.ckpt --reverse -o weights/best_torch.pt
"""

import argparse

import jax
import jax.numpy as jnp

from pytorch_segmentation_tpu.engine.checkpoint import save_checkpoint
from pytorch_segmentation_tpu.models import (MODEL_REGISTRY,
                                              build_model)
from pytorch_segmentation_tpu.utils.port_torch import (
    jax_to_py, load_pretrained_backbone)

_BACKBONE_ARCH = {
    "unet": "mobilenetv2",
    "deeplabv3plus": "resnet50",
    "pspnet": "resnet50",
    "fpn": "resnet50",
    "fastfcn": "resnet50",
    "upernet": "resnet50",  # variant r34 / mit-b* switch the converter
    "fcn": "resnet50",       # or a FULL fcn_resnet50/101 zoo checkpoint
    "deeplabv3": "resnet50",  # or a FULL deeplabv3_resnet50/101 ckpt
    "lraspp": "mobilenetv3",  # or a FULL lraspp_mobilenet_v3_large ckpt
    "segmenter": "vit",      # torchvision vit_b_16 / vit_l_16
}


def _is_tv_seg_ckpt(sd_path) -> bool:
    """True when the .pth is a FULL torchvision segmentation checkpoint
    (backbone.* keys) rather than a plain classification backbone."""
    import torch
    sd = torch.load(sd_path, map_location="cpu", weights_only=True)
    return any(k.startswith("backbone.") for k in sd)


def run(sd_path, model_name, num_classes, out_path, arch=None,
        variant=""):
    if arch is None and variant == "r34" and model_name in ("fpn",
                                                            "upernet"):
        arch = "resnet34"  # the r34 variant ports the resnet34 backbone
    if arch is None and variant.startswith("cn-") and model_name == "upernet":
        arch = "convnext"  # torchvision convnext_{tiny,small,base}
    if arch is None and variant.startswith("swin-") and model_name == "upernet":
        arch = "swin"  # torchvision swin_{t,s,b}
    if arch is None and variant.startswith("vit-") and model_name == "upernet":
        arch = "vit"  # torchvision vit_b_16 / vit_l_16
    arch = arch or _BACKBONE_ARCH.get(model_name)
    if arch is None and model_name != "segformer":
        raise SystemExit(f"--arch required for model {model_name!r} "
                         "(hrnet has no torchvision backbone)")
    from pytorch_segmentation_tpu.models import variant_kwargs
    model = build_model(model_name, num_classes=num_classes,
                        **variant_kwargs(model_name, variant))
    init_fn = jax.jit(lambda rng, x: model.init({"params": rng}, x,
                                                train=False))
    variables = init_fn(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    params = jax_to_py(variables["params"])
    stats = jax_to_py(variables.get("batch_stats", {}))
    hf_mit = (model_name == "segformer" or
              (model_name == "upernet" and variant.startswith("mit")))
    if hf_mit:
        # HuggingFace transformers checkpoint: SegformerModel (MiT
        # encoder, nvidia/mit-b*) or SegformerForSemanticSegmentation
        # (full model, ADE/Cityscapes zoo) — port_torch.py. UPerNet
        # shares the MiT encoder but not the head: backbone only.
        from pytorch_segmentation_tpu.utils.port_torch import \
            load_pretrained_segformer
        params, stats = load_pretrained_segformer(
            params, stats, sd_path,
            backbone_only=model_name == "upernet")
        arch = f"mit ({variant or 'b0'}, huggingface)"
    elif model_name in ("fcn", "deeplabv3", "lraspp") and \
            _is_tv_seg_ckpt(sd_path):
        # FULL torchvision segmentation-zoo checkpoint
        # (fcn_resnet50/101, deeplabv3_resnet50/101): backbone + heads,
        # class convs gated on channel match (utils/port_torch.py)
        from pytorch_segmentation_tpu.utils.port_torch import \
            load_pretrained_tvseg
        params, stats = load_pretrained_tvseg(params, stats, sd_path,
                                              num_classes=num_classes)
        arch = f"torchvision {model_name} zoo (full model)"
    else:
        params, stats = load_pretrained_backbone(params, stats, sd_path,
                                                 arch)
    save_checkpoint(out_path, params, stats)
    print(f"wrote {out_path} ({model_name}, backbone={arch}, "
          f"nc={num_classes})")


def run_reverse(ckpt_path, out_path, use_ema=False):
    from pytorch_segmentation_tpu.engine.checkpoint import load_checkpoint
    from pytorch_segmentation_tpu.utils.port_torch import \
        save_torch_checkpoint
    ckpt = load_checkpoint(ckpt_path)
    if use_ema and ckpt.get("ema") is None:
        raise SystemExit(f"{ckpt_path} holds no EMA params "
                         "(trained without --ema)")
    params = ckpt["ema"] if use_ema else ckpt["model"]
    save_torch_checkpoint(out_path, params, ckpt.get("batch_stats") or {})
    print(f"wrote torch checkpoint {out_path} "
          f"({'EMA ' if use_ema else ''}weights, {{'model': state_dict}})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("state_dict",
                        help="torchvision .pth file (or a framework .ckpt "
                             "with --reverse)")
    parser.add_argument("--model", type=str, default="deeplabv3plus",
                        choices=sorted(MODEL_REGISTRY))
    parser.add_argument("-nc", "--num-classes", type=int, default=21)
    parser.add_argument("-o", "--output", type=str,
                        default="weights/pretrained.ckpt")
    parser.add_argument("--variant", type=str, default="",
                        help="model size variant (fpn: r50/r34 — sets "
                             "the matching backbone port; segformer: "
                             "b0..b5, must match the HF checkpoint)")
    parser.add_argument("--arch", type=str, default=None,
                        choices=["mobilenetv2", "mobilenetv3", "resnet50",
                                 "resnet34", "convnext", "swin", "vit"],
                        help="backbone converter (defaults by model)")
    parser.add_argument("--reverse", action="store_true",
                        help="framework checkpoint -> torch "
                             "{'model': state_dict} .pt")
    parser.add_argument("--ema", action="store_true",
                        help="with --reverse: export the EMA weights")
    opt = parser.parse_args()
    if opt.reverse:
        run_reverse(opt.state_dict, opt.output, use_ema=opt.ema)
    else:
        run(opt.state_dict, opt.model, opt.num_classes, opt.output,
            opt.arch, variant=opt.variant)
