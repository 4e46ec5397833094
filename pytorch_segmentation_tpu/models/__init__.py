"""Model zoo (reference: models/__init__.py:1-3).

Adds a name registry so model choice is a CLI flag (`--model`), fixing the
reference's hard-coded selection (train.py:57-59, SURVEY.md §2.2).
"""

from .deeplabv3plus import DeepLabV3Plus
from .fpn import FPN
from .hrnet import HRNet
from .pspnet import PSPNet
from .segformer import SegFormer
from .unet import UNet

def _fastfcn(**kw):
    """FastFCN (Wu et al. 2019) = PSPNet head + Joint Pyramid Upsampling in
    place of the dilated os=8 backbone — same accuracy target at a fraction
    of the backbone FLOPs (models/pspnet.py jpu=True)."""
    return PSPNet(jpu=True, **kw)


MODEL_REGISTRY = {
    "unet": UNet,
    "deeplabv3plus": DeepLabV3Plus,
    "hrnet": HRNet,
    "pspnet": PSPNet,
    "fpn": FPN,
    "fastfcn": _fastfcn,
    "segformer": SegFormer,  # MiT-B0; variant="b1".."b5" via kwargs
}


def build_model(name: str, num_classes: int, **kwargs):
    try:
        cls = MODEL_REGISTRY[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    return cls(num_classes=num_classes, **kwargs)


__all__ = ["UNet", "DeepLabV3Plus", "HRNet", "PSPNet", "FPN", "SegFormer",
           "MODEL_REGISTRY", "build_model"]
