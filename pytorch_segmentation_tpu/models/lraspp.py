"""LR-ASPP (Lite Reduced ASPP) on MobileNetV3-Large — torchvision's
`lraspp_mobilenet_v3_large`, the zoo's mobile/edge segmentation model;
beyond the reference (which ships UNet/DeepLabV3+/HRNet only).

Torchvision semantics replicated exactly (models/tvseg.py is the same
policy for FCN/DeepLabV3): dilated MobileNetV3-Large (os=16 tail),
head over the 40ch@s8 "low" and 960ch@s16 "high" taps:

  high -> 1x1 CNA 128 ("cbr")                     \\
  high -> global avg-pool -> 1x1 conv -> sigmoid   > x = cbr * scale
  x -> bilinear x2 to the low grid (align_corners=False)
  out = 1x1 low_classifier(low) + 1x1 high_classifier(x)   @ s8
  -> bilinear x8 to input (align_corners=False).

FULL zoo checkpoints (backbone.* + classifier.*) port via
utils/port_torch.convert_tv_seg (the lraspp branch); classifier convs
gate on class-count match like the other zoo families.

TPU notes: the whole head is three 1x1 matmuls + one broadcast
multiply + one MXU-matmul resize; at bs32 512² the model is ~2 GFLOPs
— a serving-corner design like BiSeNetV2, but ImageNet-pretrainable.
full_res_output=False defers the trailing x8 into the fused Pallas
loss/eval kernels (up_align_corners=False).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..nn.backbones.mobilenetv3 import MobileNetV3
from ..nn.blocks import ConvNormAct, conv_kernel_init
from ..ops.resize import resize_bilinear

__all__ = ["LRASPP"]


class LRASPP(nn.Module):
    num_classes: int
    inter_channels: int = 128
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    full_res_output: bool = True
    up_align_corners: bool = False  # torchvision F.interpolate default
    output_stride: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = MobileNetV3(dilated=True, dtype=self.dtype,
                           axis_name=self.axis_name,
                           name="backbone")(x, train=train)
        low, high = taps[2], taps[4]        # 40ch @ s8, 960ch @ s16
        y = ConvNormAct(self.inter_channels, kernel_size=1,
                        dtype=self.dtype, axis_name=self.axis_name,
                        name="cbr")(high, train=train)
        s = high.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.inter_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=conv_kernel_init, name="scale_conv")(s)
        y = y * nn.sigmoid(s)
        y = resize_bilinear(y, (low.shape[1], low.shape[2]),
                            align_corners=False)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32,
                      kernel_init=conv_kernel_init,
                      name="low_classifier")(low)
        out = out + nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32,
                            kernel_init=conv_kernel_init,
                            name="high_classifier")(y)
        if self.full_res_output:
            out = resize_bilinear(out, (8 * out.shape[1], 8 * out.shape[2]),
                                  align_corners=False)
        return out
