"""ResNet backbones (TPU/NHWC, flax.linen).

Rebuild of the `pytorch_modules.backbones.resnet{34,50}` contract (SURVEY.md
§2.9): returns the per-stage feature list [stem, layer1..layer4], with
`replace_stride_with_dilation` converting late stages to dilated convs so
DeepLabV3+ can run at output-stride 16 (reference: models/deeplabv3plus.py:17-19
uses features[1] = 256ch stride-4 and features[-1] = 2048ch dilated stride-16).
"""

from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..blocks import ConvNormAct, ConvStatsFolded, fused_1x1_available

__all__ = ["ResNet", "resnet34_cfg", "resnet50_cfg"]


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvNormAct(self.features, 3, stride=self.stride,
                        dilation=self.dilation, dtype=self.dtype,
                        axis_name=self.axis_name, name="conv1")(x, train=train)
        y = ConvNormAct(self.features, 3, dilation=self.dilation,
                        activate=None, dtype=self.dtype,
                        axis_name=self.axis_name, name="conv2")(y, train=train)
        if self.downsample:
            residual = ConvNormAct(self.features, 1, stride=self.stride,
                                   activate=None, dtype=self.dtype,
                                   axis_name=self.axis_name,
                                   name="downsample")(x, train=train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride/dilation) -> 1x1x4 with residual add.

    On a single TPU chip the two 1x1 convs run through the block-fused
    Pallas path (ConvStatsFolded): BN statistics accumulate in each matmul's
    epilogue and the previous BN-apply+ReLU fuses into the next matmul's
    prologue, so the conv1/conv3 outputs cross HBM once instead of three
    times (docs/fused_convbn_design.md; the train step is BN-bandwidth-bound,
    PERF.md). Identical math and identical param tree — elsewhere the plain
    ConvNormAct chain runs."""

    features: int  # bottleneck width; output = features * 4
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        if fused_1x1_available():
            cdt = self.dtype
            ones = jnp.ones(x.shape[-1], jnp.float32)
            zeros = jnp.zeros(x.shape[-1], jnp.float32)
            # x is post-relu (block inputs are relu outputs), so the
            # prologue relu(x*1+0) is exact
            y1, sc1, sh1 = ConvStatsFolded(
                self.features, 1, dtype=cdt, axis_name=self.axis_name,
                name="conv1")(x, ones, zeros, train=train)
            y2, sc2, sh2 = ConvStatsFolded(
                self.features, 3, stride=self.stride,
                dilation=self.dilation, dtype=cdt,
                axis_name=self.axis_name,
                name="conv2")(y1, sc1, sh1, train=train)
            y3, sc3, sh3 = ConvStatsFolded(
                self.features * 4, 1, dtype=cdt, axis_name=self.axis_name,
                name="conv3")(y2, sc2, sh2, train=train)
            y = y3.astype(cdt) * sc3.astype(cdt) + sh3.astype(cdt)
        else:
            y = ConvNormAct(self.features, 1, dtype=self.dtype,
                            axis_name=self.axis_name,
                            name="conv1")(x, train=train)
            # stride on the 3x3 (torchvision v1.5+ convention)
            y = ConvNormAct(self.features, 3, stride=self.stride,
                            dilation=self.dilation, dtype=self.dtype,
                            axis_name=self.axis_name,
                            name="conv2")(y, train=train)
            y = ConvNormAct(self.features * 4, 1, activate=None,
                            dtype=self.dtype, axis_name=self.axis_name,
                            name="conv3")(y, train=train)
        if self.downsample:
            residual = ConvNormAct(self.features * 4, 1, stride=self.stride,
                                   activate=None, dtype=self.dtype,
                                   axis_name=self.axis_name,
                                   name="downsample")(x, train=train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Feature-list ResNet. `block` is 'basic' or 'bottleneck'.

    remat=True rematerializes each residual block's activations in the
    backward pass (jax.checkpoint) — trades ~30% more FLOPs for a large HBM
    saving, unlocking bigger per-chip batches at high resolution."""

    block: str
    layers: Sequence[int]
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        expansion = 1 if self.block == "basic" else 4

        # stem: 7x7/2 conv + BN + ReLU, then 3x3/2 maxpool (pad 1, -inf)
        x = ConvNormAct(64, kernel_size=7, stride=2, dtype=self.dtype,
                        axis_name=self.axis_name, name="stem")(x, train=train)
        features = [x]
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        widths = (64, 128, 256, 512)
        dilation = 1
        for stage_i, (width, n_blocks) in enumerate(zip(widths, self.layers)):
            stride = 1 if stage_i == 0 else 2
            # torchvision _make_layer: when a stage trades stride for
            # dilation, its FIRST block keeps the previous dilation and only
            # blocks 1..n-1 use the increased one — required for activation
            # parity with ported torchvision weights.
            prev_dilation = dilation
            if stage_i > 0 and self.replace_stride_with_dilation[stage_i - 1]:
                dilation *= stride
                stride = 1
            for block_i in range(n_blocks):
                downsample = block_i == 0 and (
                    stride != 1 or x.shape[-1] != width * expansion)
                # train passed positionally: nn.remat statics must be
                # positional (static_argnums=(2,))
                x = block_cls(width,
                              stride=stride if block_i == 0 else 1,
                              dilation=prev_dilation if block_i == 0
                              else dilation,
                              downsample=downsample,
                              dtype=self.dtype,
                              axis_name=self.axis_name,
                              name=f"layer{stage_i + 1}_block{block_i}")(
                                  x, train)
            features.append(x)
        return features


def resnet34_cfg(**kw):
    return dict(block="basic", layers=(3, 4, 6, 3), **kw)


def resnet50_cfg(**kw):
    return dict(block="bottleneck", layers=(3, 4, 6, 3), **kw)
