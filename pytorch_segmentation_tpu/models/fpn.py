"""Semantic FPN — a model family BEYOND the reference
(WoodsGao/pytorch_segmentation ships UNet/DeepLabV3+/HRNet only; this is
the Panoptic-FPN semantic branch of Kirillov et al. CVPR'19, built from
the framework's own blocks so every subsystem — fused Pallas loss/eval
kernels via full_res_output=False at output-stride 4, int8 PTQ, EMA/TTA,
export, torchvision-backbone porting, remat — composes).

Architecture: ResNet feature pyramid C2..C5 (the backbone's feature-list
contract, nn/backbones/resnet.py) -> 1x1 lateral ConvNormAct (BN, no act,
keeping the top-down sum linear) to `fpn_channels`, top-down pathway with
exact-torch nearest upsampling (ops/resize.resize_nearest) and addition,
3x3 smoothing ConvNormAct per level; the segmentation head brings every
level to stride 4 with per-stage (3x3 ConvNormAct -> x2 bilinear
align_corners=False) blocks (BN replaces the paper's GroupNorm — the
framework's BatchNorm2d carries the torch-exact running-stat semantics
every other model family uses), sums the four stride-4 maps, applies the
1x1 class conv, and bilinearly upsamples x4.

Works with both residual block types: block='bottleneck' (ResNet-50,
laterals 256/512/1024/2048) and block='basic' (ResNet-34, laterals
64/128/256/512 — exercising the resnet34 torchvision port path).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..nn.backbones.resnet import ResNet
from ..nn.blocks import ConvNormAct, conv_kernel_init
from ..ops.resize import resize_bilinear, resize_nearest

__all__ = ["FPN"]


class FPN(nn.Module):
    num_classes: int
    backbone_layers: tuple = (3, 4, 6, 3)  # ResNet-50
    block: str = "bottleneck"
    fpn_channels: int = 256
    seg_channels: int = 128
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    # full_res_output=False returns stride-4 logits, deferring the final
    # bilinear x4 into the fused loss/eval kernels — identical math.
    full_res_output: bool = True
    up_align_corners: bool = False
    output_stride: int = 4
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNet(block=self.block, layers=self.backbone_layers,
                       dtype=self.dtype, axis_name=self.axis_name,
                       remat=self.remat,
                       name="backbone")(x, train=train)[1:]  # C2..C5
        sizes = [f.shape[1:3] for f in feats]

        def cna(ch, k, name, act=nn.relu):
            return ConvNormAct(ch, kernel_size=k, activate=act,
                               dtype=self.dtype, axis_name=self.axis_name,
                               name=name)

        # top-down pathway: lateral 1x1 (linear) + nearest x2 + add
        p = cna(self.fpn_channels, 1, "lat3", act=None)(feats[3], train=train)
        pyramid = [p]
        for i in (2, 1, 0):
            lat = cna(self.fpn_channels, 1, f"lat{i}", act=None)(
                feats[i], train=train)
            p = lat + resize_nearest(p, sizes[i])
            pyramid.insert(0, p)
        pyramid = [cna(self.fpn_channels, 3, f"smooth{i}")(p, train=train)
                   for i, p in enumerate(pyramid)]

        # segmentation head: every level to stride 4, then sum
        y = cna(self.seg_channels, 3, "head0_0")(pyramid[0], train=train)
        for i in (1, 2, 3):
            z = pyramid[i]
            for j in range(i):
                z = cna(self.seg_channels, 3, f"head{i}_{j}")(z, train=train)
                z = resize_bilinear(z, sizes[i - 1 - j], align_corners=False)
            y = y + z

        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=conv_kernel_init,
                    name="cls_conv")(y)
        if self.full_res_output:
            y = resize_bilinear(y, (4 * y.shape[1], 4 * y.shape[2]),
                                align_corners=False)
        return y
