"""MobileNetV2 feature-extractor backbone (TPU/NHWC, flax.linen).

Rebuild of the `pytorch_modules.backbones.mobilenet_v2` contract inferred in
SURVEY.md §2.9: returns 5 feature taps (x1..x4, x) with channels
16/24/32/96/1280 at strides 2/4/8/16/32 — the skip connections consumed by
UNet (reference: models/unet.py:16-17, 28 and concat math at :19-23, 34-46).

Pretrained torchvision weights can be ported into this param tree with
pytorch_segmentation_tpu.utils.port_torch (no network access is assumed).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..blocks import ConvNormAct, ConvStatsFolded, fused_1x1_available

__all__ = ["MobileNetV2", "MOBILENETV2_TAP_CHANNELS"]

MOBILENETV2_TAP_CHANNELS = (16, 24, 32, 96, 1280)

# (expand_ratio t, channels c, repeats n, stride s) — standard MobileNetV2
_INVERTED_RESIDUAL_CFG = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def relu6(x):
    return jnp.minimum(nn.relu(x), jnp.asarray(6.0, x.dtype))


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand_ratio: int
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        hidden = in_features * self.expand_ratio
        use_residual = self.stride == 1 and in_features == self.features
        if fused_1x1_available() and self.expand_ratio != 1:
            # block-fused path (see resnet.Bottleneck): expand's statistics
            # ride its matmul epilogue; the depthwise output's BN+relu6
            # fuses into project's prologue. Identical math + param tree.
            cdt = self.dtype
            ones = jnp.ones(in_features, jnp.float32)
            zeros = jnp.zeros(in_features, jnp.float32)
            # block inputs carry no activation (project has none), so the
            # expand prologue is the identity
            y1, sc1, sh1 = ConvStatsFolded(
                hidden, 1, act_in="none", dtype=cdt,
                axis_name=self.axis_name, name="expand")(x, ones, zeros,
                                                         train=train)
            y2, sc2, sh2 = ConvStatsFolded(
                hidden, 3, stride=self.stride, groups=hidden,
                act_in="relu6", dtype=cdt, axis_name=self.axis_name,
                name="depthwise")(y1, sc1, sh1, train=train)
            y3, sc3, sh3 = ConvStatsFolded(
                self.features, 1, act_in="relu6", dtype=cdt,
                axis_name=self.axis_name, name="project")(y2, sc2, sh2,
                                                          train=train)
            y = y3.astype(cdt) * sc3.astype(cdt) + sh3.astype(cdt)
        else:
            y = x
            if self.expand_ratio != 1:
                y = ConvNormAct(hidden, kernel_size=1, activate=relu6,
                                dtype=self.dtype, axis_name=self.axis_name,
                                name="expand")(y, train=train)
            y = ConvNormAct(hidden, kernel_size=3, stride=self.stride,
                            groups=hidden, activate=relu6, dtype=self.dtype,
                            axis_name=self.axis_name,
                            name="depthwise")(y, train=train)
            y = ConvNormAct(self.features, kernel_size=1, activate=None,
                            dtype=self.dtype, axis_name=self.axis_name,
                            name="project")(y, train=train)
        if use_residual:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    """Returns (x1, x2, x3, x4, x) taps at strides 2/4/8/16/32."""

    width_mult: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def c(ch):
            return max(8, int(ch * self.width_mult + 4) // 8 * 8) if self.width_mult != 1.0 else ch

        x = ConvNormAct(c(32), kernel_size=3, stride=2, activate=relu6,
                        dtype=self.dtype, axis_name=self.axis_name,
                        name="stem")(x, train=train)
        taps = []
        tap_after = {0: 0, 1: 1, 2: 2, 4: 3}  # cfg-stage index -> tap slot
        for stage_i, (t, ch, n, s) in enumerate(_INVERTED_RESIDUAL_CFG):
            for block_i in range(n):
                x = InvertedResidual(
                    c(ch), stride=s if block_i == 0 else 1, expand_ratio=t,
                    dtype=self.dtype, axis_name=self.axis_name,
                    name=f"stage{stage_i}_block{block_i}")(x, train=train)
            if stage_i in tap_after:
                taps.append(x)
        x = ConvNormAct(c(1280), kernel_size=1, activate=relu6,
                        dtype=self.dtype, axis_name=self.axis_name,
                        name="head")(x, train=train)
        taps.append(x)
        return tuple(taps)
