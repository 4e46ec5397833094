from .blocks import BN_MOMENTUM, ConvNormAct, SeparableConvNormAct, conv_kernel_init

__all__ = ["ConvNormAct", "SeparableConvNormAct", "conv_kernel_init", "BN_MOMENTUM"]
