from .mobilenetv2 import MOBILENETV2_TAP_CHANNELS, MobileNetV2
from .resnet import ResNet, resnet34_cfg, resnet50_cfg

__all__ = ["MobileNetV2", "MOBILENETV2_TAP_CHANNELS", "ResNet",
           "resnet34_cfg", "resnet50_cfg"]
