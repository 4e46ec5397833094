"""UNet with MobileNetV2 encoder (TPU-native rebuild of reference
models/unet.py:13-56).

Decoder: three ConvNormAct up-convs (1280→256, 352→128, 160→64) with ×2
bilinear (align_corners=True) upsampling and skip concatenation from encoder
taps x4/x3/x2, a 3×3 class conv at 88 channels (64+24), and two final ×2
upsamples bracketing it — output logits at full input resolution, matching
the reference concat arithmetic exactly (unet.py:19-23, 30-55).

Upsampling is MXU-matmul bilinear (ops/resize.py) rather than torch
F.interpolate; layout NHWC; logits returned as [B, H, W, num_classes].
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..nn.backbones.mobilenetv2 import MobileNetV2
from ..nn.blocks import ConvNormAct, conv_kernel_init
from ..ops.resize import upsample2x

__all__ = ["UNet"]


class UNet(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    # full_res_output=False returns logits at stride 2, deferring the final
    # bilinear x2 into the loss (mathematically identical — bilinear resize
    # is linear and trailing; saves materializing full-res logits + grads).
    full_res_output: bool = True
    # coordinate convention of the deferred upsample (unet.py:52-55)
    up_align_corners: bool = True
    output_stride: int = 2  # stride of logits when full_res_output=False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1, x2, x3, x4, x = MobileNetV2(
            dtype=self.dtype, axis_name=self.axis_name,
            name="backbone")(x, train=train)
        del x1  # stride-2 tap unused by the reference decoder

        x = ConvNormAct(256, dtype=self.dtype, axis_name=self.axis_name,
                        name="up_conv0")(x, train=train)
        x = upsample2x(x, align_corners=True)
        x = jnp.concatenate([x, x4], axis=-1)  # 256 + 96 = 352
        x = ConvNormAct(128, dtype=self.dtype, axis_name=self.axis_name,
                        name="up_conv1")(x, train=train)
        x = upsample2x(x, align_corners=True)
        x = jnp.concatenate([x, x3], axis=-1)  # 128 + 32 = 160
        x = ConvNormAct(64, dtype=self.dtype, axis_name=self.axis_name,
                        name="up_conv2")(x, train=train)
        x = upsample2x(x, align_corners=True)
        x = jnp.concatenate([x, x2], axis=-1)  # 64 + 24 = 88
        x = upsample2x(x, align_corners=True)
        x = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=conv_kernel_init, name="cls_conv")(x)
        if self.full_res_output:
            x = upsample2x(x, align_corners=True)
        return x
