"""PSPNet (pyramid scene parsing) — a model family BEYOND the reference
(WoodsGao/pytorch_segmentation ships UNet/DeepLabV3+/HRNet only; this is
the classic Zhao et al. CVPR'17 architecture, built from the same
framework blocks so every subsystem — fused Pallas loss/eval kernels,
deferred upsample, int8 PTQ, EMA/TTA, export, porting — composes).

Architecture: ResNet-50 at output-stride 8 (layer3+4 dilated), pyramid
pooling over bins (1, 2, 3, 6): each bin adaptively average-pools the
2048ch feature map (ops/pool.py — exact torch AdaptiveAvgPool2d window
semantics), projects to 512ch with a 1x1 ConvNormAct and bilinearly
upsamples back (align_corners=True, the hszhao/semseg convention); concat
(2048 + 4*512 = 4096) -> 3x3 ConvNormAct 4096->512 -> 1x1 class conv ->
x8 upsample. The canonical head dropout is omitted (BN provides the
regularization here; keeps eval == train graph shape). Aux head omitted
(train-time-only auxiliary loss).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..nn.backbones.resnet import ResNet
from ..nn.blocks import ConvNormAct, conv_kernel_init
from ..ops.pool import adaptive_avg_pool2d
from ..ops.resize import resize_bilinear

__all__ = ["PSPNet"]


class PSPNet(nn.Module):
    num_classes: int
    backbone_layers: tuple = (3, 4, 6, 3)  # ResNet-50
    bins: tuple = (1, 2, 3, 6)
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    # full_res_output=False returns stride-8 logits, deferring the final
    # bilinear x8 into the fused loss/eval kernels — identical math.
    full_res_output: bool = True
    up_align_corners: bool = True
    output_stride: int = 8
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = ResNet(block="bottleneck", layers=self.backbone_layers,
                          replace_stride_with_dilation=(False, True, True),
                          dtype=self.dtype, axis_name=self.axis_name,
                          remat=self.remat,
                          name="backbone")(x, train=train)
        y = features[-1]  # 2048ch @ stride 8 (dilated)
        h, w = y.shape[1], y.shape[2]
        branches = [y]
        for b in self.bins:
            p = adaptive_avg_pool2d(y, (b, b))
            p = ConvNormAct(512, kernel_size=1, dtype=self.dtype,
                            axis_name=self.axis_name,
                            name=f"ppm_conv{b}")(p, train=train)
            branches.append(resize_bilinear(p, (h, w), align_corners=True))
        y = jnp.concatenate(branches, axis=-1)  # 2048 + 4*512 = 4096
        y = ConvNormAct(512, kernel_size=3, dtype=self.dtype,
                        axis_name=self.axis_name, name="head")(y, train=train)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=conv_kernel_init,
                    name="cls_conv")(y)
        if self.full_res_output:
            y = resize_bilinear(y, (8 * y.shape[1], 8 * y.shape[2]),
                                align_corners=True)
        return y
