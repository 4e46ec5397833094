"""HRNet for semantic segmentation (TPU-native rebuild of reference
models/hrnet.py:27-406).

Structure: stem (two stride-2 ConvNormActs — first with no activation — plus
four Bottlenecks at width 64 → 256ch), then three high-resolution stages with
2/3/4 parallel branches (BasicBlock×4 per branch, channels 32·2^i), connected
by transition layers and all-to-all multi-resolution fusion:
  j > i : 1×1 ConvNormAct + 2^(j-i)× bilinear upsample (align_corners=False)
  j < i : chain of stride-2 3×3 ConvNormActs, last one activation-free
Final stage fuses everything into the highest-resolution branch
(multi_scale_output=False), 1×1 class conv, ×4 bilinear upsample
(align_corners=False) — reference models/hrnet.py:187-228, 255-299, 401-404.

All upsampling is MXU-matmul bilinear (ops/resize.py); layout NHWC.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.backbones.resnet import BasicBlock, Bottleneck
from ..nn.blocks import ConvNormAct, conv_kernel_init
from ..ops.resize import resize_bilinear

__all__ = ["HRNet"]


class HRModule(nn.Module):
    """One high-resolution module: per-branch residual blocks + full fuse."""

    num_branches: int
    channels: Sequence[int]  # per-branch channel counts
    num_blocks: int = 4
    multi_scale_output: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        assert len(xs) == self.num_branches
        # branches
        ys = []
        for i in range(self.num_branches):
            y = xs[i]
            for b in range(self.num_blocks):
                y = BasicBlock(self.channels[i],
                               downsample=(y.shape[-1] != self.channels[i] and b == 0),
                               dtype=self.dtype, axis_name=self.axis_name,
                               name=f"branch{i}_block{b}")(y, train=train)
            ys.append(y)
        if self.num_branches == 1:
            return ys

        num_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(num_out):
            acc = None
            for j in range(self.num_branches):
                if j == i:
                    z = ys[j]
                elif j > i:
                    z = ConvNormAct(self.channels[i], kernel_size=1,
                                    dtype=self.dtype, axis_name=self.axis_name,
                                    name=f"fuse{i}_{j}")(ys[j], train=train)
                    scale = 2 ** (j - i)
                    z = resize_bilinear(
                        z, (z.shape[1] * scale, z.shape[2] * scale),
                        align_corners=False)
                else:  # j < i: chain of stride-2 convs
                    z = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        z = ConvNormAct(
                            self.channels[i] if last else self.channels[j],
                            kernel_size=3, stride=2,
                            activate=None if last else nn.relu,
                            dtype=self.dtype, axis_name=self.axis_name,
                            name=f"fuse{i}_{j}_down{k}")(z, train=train)
                acc = z if acc is None else acc + z
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    num_classes: int = 2
    num_branches_list: Sequence[int] = (2, 3, 4)
    base_channels: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    # full_res_output=False returns stride-4 logits, deferring the final
    # bilinear x4 (hrnet.py:401-404, align_corners=False) into the loss.
    full_res_output: bool = True
    up_align_corners: bool = False
    output_stride: int = 4
    # feature_output=True turns the model into an HRNetV2 BACKBONE: the
    # last stage keeps every branch (multi_scale_output=True), the lower
    # resolutions bilinear-upsample (align_corners=False) onto branch 0
    # and concatenate — [B, H/4, W/4, sum(channels)] (= 480 at width 32).
    # No classifier / final upsample params are created. Used by OCRNet
    # (models/ocrnet.py), whose head consumes the multi-scale concat.
    feature_output: bool = False

    def _channels(self, num_branches):
        return [self.base_channels * (2 ** i) for i in range(num_branches)]

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem (reference models/hrnet.py:257-260): note the first conv has
        # no activation, the second does; then 4 Bottlenecks at width 64.
        x = ConvNormAct(64, 3, stride=2, activate=None, dtype=self.dtype,
                        axis_name=self.axis_name, name="stem_conv1")(x, train=train)
        x = ConvNormAct(64, 3, stride=2, dtype=self.dtype,
                        axis_name=self.axis_name, name="stem_conv2")(x, train=train)
        for b in range(4):
            x = Bottleneck(64, downsample=(b == 0), dtype=self.dtype,
                           axis_name=self.axis_name,
                           name=f"stem_bottleneck{b}")(x, train=train)

        ys = [x]  # current branch list; channels [256]
        prev_channels = [256]
        for stage_i, num_branches in enumerate(self.num_branches_list):
            cur_channels = self._channels(num_branches)
            # transition (reference models/hrnet.py:311-334)
            xs = []
            for i in range(num_branches):
                if i < len(prev_channels):
                    if prev_channels[i] != cur_channels[i]:
                        xs.append(ConvNormAct(
                            cur_channels[i], 3, dtype=self.dtype,
                            axis_name=self.axis_name,
                            name=f"transition{stage_i}_{i}")(ys[i], train=train))
                    else:
                        xs.append(ys[i])
                else:
                    z = ys[-1]
                    for j in range(i + 1 - len(prev_channels)):
                        out_ch = (cur_channels[i]
                                  if j == i - len(prev_channels)
                                  else prev_channels[-1])
                        z = ConvNormAct(out_ch, 3, stride=2, dtype=self.dtype,
                                        axis_name=self.axis_name,
                                        name=f"transition{stage_i}_{i}_down{j}")(
                                            z, train=train)
                    xs.append(z)
            last_stage = stage_i == len(self.num_branches_list) - 1
            ys = HRModule(num_branches, cur_channels,
                          multi_scale_output=(self.feature_output
                                              or not last_stage),
                          dtype=self.dtype, axis_name=self.axis_name,
                          name=f"stage{stage_i}")(xs, train=train)
            prev_channels = cur_channels

        if self.feature_output:
            outs = [ys[0]] + [
                resize_bilinear(y, ys[0].shape[1:3], align_corners=False)
                for y in ys[1:]]
            return jnp.concatenate(outs, axis=-1)

        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=conv_kernel_init,
                    name="final_layer")(ys[0])
        if self.full_res_output:
            y = resize_bilinear(y, (y.shape[1] * 4, y.shape[2] * 4),
                                align_corners=False)
        return y
