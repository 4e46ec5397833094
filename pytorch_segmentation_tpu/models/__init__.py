"""Model zoo (reference: models/__init__.py:1-3).

Adds a name registry so model choice is a CLI flag (`--model`), fixing the
reference's hard-coded selection (train.py:57-59, SURVEY.md §2.2).
"""

from .bisenetv2 import BiSeNetV2
from .danet import DANet
from .deeplabv3plus import DeepLabV3Plus
from .fpn import FPN
from .hrnet import HRNet
from .ocrnet import OCRNet
from .pspnet import PSPNet
from .lraspp import LRASPP
from .maskformer import MaskFormer, make_maskformer_loss
from .segformer import SegFormer
from .segmenter import Segmenter
from .segnext import SegNeXt
from .tvseg import FCN, DeepLabV3
from .unet import UNet
from .upernet import UPerNet

def _fastfcn(**kw):
    """FastFCN (Wu et al. 2019) = PSPNet head + Joint Pyramid Upsampling in
    place of the dilated os=8 backbone — same accuracy target at a fraction
    of the backbone FLOPs (models/pspnet.py jpu=True)."""
    return PSPNet(jpu=True, **kw)


MODEL_REGISTRY = {
    "unet": UNet,
    "bisenetv2": BiSeNetV2,
    "danet": DANet,  # dual attention over dilated ResNet (danet.py)
    "deeplabv3plus": DeepLabV3Plus,
    "hrnet": HRNet,
    "ocrnet": OCRNet,  # HRNet + object-contextual head; width via --variant
    "pspnet": PSPNet,
    "fpn": FPN,
    "fastfcn": _fastfcn,
    "segformer": SegFormer,  # MiT-B0; variant="b1".."b5" via kwargs
    "segnext": SegNeXt,  # MSCAN-T + LightHam; variant="s"/"b" (segnext.py)
    "segmenter": Segmenter,  # ViT + Mask Transformer (segmenter.py)
    # mask classification (set prediction): train.py pairs it with
    # make_maskformer_loss; eval forward emits semantic logits
    "maskformer": MaskFormer,
    "upernet": UPerNet,  # ResNet-50; variant="mit-b0".. for the MiT encoder
    "fcn": FCN,  # torchvision fcn_resnet50/101 semantics (tvseg.py)
    "deeplabv3": DeepLabV3,  # torchvision deeplabv3_resnet50/101
    "lraspp": LRASPP,  # torchvision lraspp_mobilenet_v3_large (lraspp.py)
}


def build_model(name: str, num_classes: int, **kwargs):
    try:
        cls = MODEL_REGISTRY[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    return cls(num_classes=num_classes, **kwargs)


# per-family size variants selectable from the CLIs (--variant)
MODEL_VARIANTS = {
    # tiny/tiny-d4 are NOT paper variants: 1-block (resp. 4-deep stage-3)
    # stages for affordable test/CPU-drive compiles (segformer.py)
    "segformer": {v: {"variant": v} for v in
                  ("b0", "b1", "b2", "b3", "b4", "b5", "tiny", "tiny-d4")},
    "fpn": {
        "r50": {},  # the default bottleneck (3,4,6,3) backbone
        "r34": {"block": "basic", "backbone_layers": (3, 4, 6, 3)},
    },
    # MSCAN sizes (paper mscan-t/s/b; "tiny" = 1-block test dims)
    "segnext": {v: {"variant": v} for v in ("tiny", "t", "s", "b")},
    # ViT trunk sizes for the Mask Transformer ("pico" = test dims)
    "segmenter": {v: {"variant": v} for v in ("pico", "b16", "l16")},
    "maskformer": {
        "r50": {},  # the paper's R50 semantic config (Q=100, 6 layers)
        # NOT a paper variant: shallow test dims for CPU drives
        "tiny": {"backbone_layers": (1, 1, 1, 1), "dim": 64,
                 "mask_dim": 64, "fpn_channels": 64, "num_queries": 8,
                 "heads": 4, "dec_layers": 2},
    },
    "upernet": {
        "r50": {},  # the default bottleneck (3,4,6,3) backbone
        "r34": {"block": "basic", "backbone_layers": (3, 4, 6, 3)},
        **{f"mit-{v}": {"encoder": "mit", "mit_variant": v}
           for v in ("b0", "b1", "b2", "b3", "b4", "b5", "tiny")},
        # ConvNeXt encoders (the paper's own segmentation recipe pairs
        # ConvNeXt with UPerNet); cn-pico is the test-compile size
        **{f"cn-{v}": {"encoder": "convnext", "convnext_variant": v}
           for v in ("t", "s", "b", "pico")},
        # Swin encoders (the Swin paper's segmentation pairing)
        **{f"swin-{v}": {"encoder": "swin", "swin_variant": v}
           for v in ("t", "s", "b", "pico")},
        # plain-ViT encoders (mmseg upernet_vit "mln" recipe; ports
        # torchvision vit_b_16 / vit_l_16 classification checkpoints)
        **{f"vit-{v}": {"encoder": "vit", "vit_variant": v}
           for v in ("b16", "l16", "pico")},
    },
    # torchvision-zoo backbone depths (fcn_resnet50/101 analogs)
    "fcn": {
        "r50": {},
        "r101": {"backbone_layers": (3, 4, 23, 3)},
    },
    "deeplabv3": {
        "r50": {},
        "r101": {"backbone_layers": (3, 4, 23, 3)},
    },
    "danet": {
        "r50": {},
        "r101": {"backbone_layers": (3, 4, 23, 3)},
    },
    # HRNet widths (mmseg ocrnet_hr18/hr48 analogs; w32 = the zoo's
    # hrnet default so --model ocrnet upgrades its decoder in place)
    "ocrnet": {
        "w18": {"base_channels": 18},
        "w32": {},
        "w48": {"base_channels": 48},
    },
}


def variant_kwargs(name: str, variant: str) -> dict:
    """Model-ctor kwargs for a CLI `--variant` selection; '' = defaults.
    Raises with the valid choices when the family has none or the name is
    unknown (the reference had no model-size axis at all — SegFormer
    B0..B5 / FPN R50/R34 are this framework's additions)."""
    if not variant:
        return {}
    table = MODEL_VARIANTS.get(name.lower())
    if not table:
        raise ValueError(f"model {name!r} has no variants "
                         f"(families with variants: "
                         f"{sorted(MODEL_VARIANTS)})")
    try:
        return dict(table[variant.lower()])
    except KeyError:
        raise ValueError(f"unknown {name} variant {variant!r}; "
                         f"available: {sorted(table)}")


def apply_scan_blocks(name: str, model_kw: dict, enabled: bool) -> dict:
    """CLI helper for `--scan-blocks`: stacked-params block stages
    (models/segformer.py _BlockStack) are a transformer-family feature;
    reject other families with a CLI-grade error so every entry point
    gates identically."""
    if enabled:
        if name.lower() != "segformer":
            raise SystemExit("--scan-blocks targets the transformer "
                             "family's stacked block stages (segformer)")
        model_kw["scan_blocks"] = True
    return model_kw


def apply_moe(name: str, model_kw: dict, experts: int,
              top_k: int = 2) -> dict:
    """CLI helper for `--moe E [--moe-top-k K]`: mixture-of-experts FFNs
    (nn/moe.py) are a transformer-family feature — alternate stage-3/4
    blocks of the MiT encoder get routed E-expert MLPs. Every entry
    point (train/test/inference/serve/export) gates identically, and
    eval CLIs must pass the SAME --moe as training so the checkpoint's
    expert trees reconstruct."""
    if experts:
        if name.lower() != "segformer":
            raise SystemExit("--moe targets the transformer family's "
                             "FFNs (segformer)")
        model_kw["moe_experts"] = int(experts)
        model_kw["moe_top_k"] = int(top_k)
    return model_kw


__all__ = ["UNet", "BiSeNetV2", "DANet", "DeepLabV3Plus", "HRNet", "OCRNet",
           "PSPNet", "FPN",
           "MaskFormer", "SegFormer", "SegNeXt", "Segmenter",
           "UPerNet", "FCN", "DeepLabV3", "LRASPP",
           "MODEL_REGISTRY", "MODEL_VARIANTS", "build_model",
           "variant_kwargs", "apply_scan_blocks", "apply_moe"]
