"""DeepLabV3+ with dilated ResNet-50 (TPU-native rebuild of reference
models/deeplabv3plus.py:14-44).

ResNet-50 at output-stride 16 (layer4 dilated), low-level tap = layer1
(256ch, stride 4) projected to 128ch by a 1×1 ConvNormAct, ASPP(2048→256,
rates 6/12/18), ×4 bilinear align_corners=True upsample, concat (384ch),
3×3 class conv, final ×4 align_corners=True upsample to input resolution.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..nn.backbones.resnet import ResNet
from ..nn.blocks import ConvNormAct, conv_kernel_init
from ..ops.resize import resize_bilinear
from .aspp import ASPP

__all__ = ["DeepLabV3Plus"]


class DeepLabV3Plus(nn.Module):
    num_classes: int
    # ResNet-50 depths by default; override for lighter variants
    backbone_layers: tuple = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    # full_res_output=False returns stride-4 logits, deferring the final
    # bilinear x4 (deeplabv3plus.py:39-43) into the loss — identical math,
    # no full-res logits/grads in HBM.
    full_res_output: bool = True
    up_align_corners: bool = True
    output_stride: int = 4
    remat: bool = False  # rematerialize backbone blocks (bigger batches)

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = ResNet(block="bottleneck", layers=self.backbone_layers,
                          replace_stride_with_dilation=(False, False, True),
                          dtype=self.dtype, axis_name=self.axis_name,
                          remat=self.remat,
                          name="backbone")(x, train=train)
        low = features[1]  # 256ch @ stride 4
        low = ConvNormAct(128, kernel_size=1, dtype=self.dtype,
                          axis_name=self.axis_name, name="project")(low, train=train)
        y = features[-1]  # 2048ch @ stride 16 (dilated)
        y = ASPP(256, atrous_rates=(6, 12, 18), dtype=self.dtype,
                 axis_name=self.axis_name, name="aspp")(y, train=train)
        y = resize_bilinear(y, (low.shape[1], low.shape[2]), align_corners=True)
        y = jnp.concatenate([y, low], axis=-1)  # 256 + 128 = 384
        y = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=conv_kernel_init, name="cls_conv")(y)
        if self.full_res_output:
            y = resize_bilinear(y, (4 * y.shape[1], 4 * y.shape[2]),
                                align_corners=True)
        return y
