"""FCN and DeepLabV3 (plain) — the torchvision segmentation-zoo
families, beyond the reference (WoodsGao/pytorch_segmentation ships
UNet/DeepLabV3+/HRNet only).

Why these two: `torchvision.models.segmentation.fcn_resnet50/101` and
`deeplabv3_resnet50/101` ship PRE-TRAINED COCO/VOC weights, and both
port 1:1 into these models through `utils/port_torch.convert_tv_seg`
(full checkpoint: backbone + classifier + aux head) — so the day real
.pth files land in the environment they give an immediate
pretrained-mIoU parity vector on top of the runbook's backbone-only
path (docs/MIOU_PARITY_RUNBOOK.md).

Torchvision semantics replicated exactly (they differ from both the
reference's DeepLabV3+ and hszhao PSPNet):
  - backbone: resnet50/101 with replace_stride_with_dilation =
    (False, True, True) -> output stride 8.
  - FCNHead: 3x3 ConvNormAct in->in/4 then 1x1 class conv (dropout
    omitted like every stochastic regularizer here; it carries no
    params so zoo checkpoints still port).
  - DeepLabHead: ASPP with rates (12, 24, 36) — 1x1 branch, three
    dilated 3x3 branches, global-pool branch (1x1 CNA on the pooled
    vector, broadcast back), concat 1280 -> 1x1 project to 256 ->
    extra 3x3 CNA 256 -> 1x1 class conv.
  - trailing upsample is bilinear with align_corners=False (torchvision
    F.interpolate default — NOT the align_corners=True the other
    families use); `up_align_corners=False` threads that through the
    fused loss/eval kernels when full_res_output=False defers it.
  - aux head (train.py --aux-loss): torchvision's FCNHead on layer3.

TPU-first notes: os=8 keeps every head matmul at 1/64 of input pixels;
the ASPP pool branch is a mean + (1,1)-conv + broadcast (no resize
matmul needed from a 1x1 source); everything else is ConvNormAct ->
XLA conv fusions on the MXU; composes with deferred upsampling, fused
Pallas loss/eval, int8 PTQ, EMA/TTA, distillation, and export like
every family.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..nn.backbones.resnet import ResNet
from ..nn.blocks import ConvNormAct, conv_kernel_init
from ..ops.resize import resize_bilinear

__all__ = ["FCN", "DeepLabV3"]


class _AuxHead(nn.Module):
    """torchvision FCNHead on the layer3 tap (1024 -> 256 -> classes);
    built unconditionally so params exist from the train=False init,
    returned only in train mode (same contract as pspnet.py aux)."""

    num_classes: int
    dtype: jnp.dtype
    axis_name: str | None

    @nn.compact
    def __call__(self, c4, train: bool = False):
        a = ConvNormAct(256, kernel_size=3, dtype=self.dtype,
                        axis_name=self.axis_name,
                        name="aux_conv")(c4, train=train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32,
                       kernel_init=conv_kernel_init, name="aux_cls")(a)


class FCN(nn.Module):
    """torchvision fcn_resnet50/101: dilated-os8 ResNet + FCNHead."""

    num_classes: int
    backbone_layers: tuple = (3, 4, 6, 3)  # r50; r101 = (3, 4, 23, 3)
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    full_res_output: bool = True
    up_align_corners: bool = False  # torchvision F.interpolate default
    output_stride: int = 8
    remat: bool = False
    aux: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = ResNet(block="bottleneck", layers=self.backbone_layers,
                          replace_stride_with_dilation=(False, True, True),
                          dtype=self.dtype, axis_name=self.axis_name,
                          remat=self.remat, name="backbone")(x, train=train)
        y = ConvNormAct(512, kernel_size=3, dtype=self.dtype,
                        axis_name=self.axis_name,
                        name="head")(features[-1], train=train)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=conv_kernel_init,
                    name="cls_conv")(y)
        if self.full_res_output:
            y = resize_bilinear(y, (8 * y.shape[1], 8 * y.shape[2]),
                                align_corners=False)
        if self.aux:
            a = _AuxHead(self.num_classes, self.dtype, self.axis_name,
                         name="aux_head")(features[3], train=train)
            if train:
                return y, a
        return y


class DeepLabV3(nn.Module):
    """torchvision deeplabv3_resnet50/101: dilated-os8 ResNet +
    ASPP(12, 24, 36) DeepLabHead (no decoder — that's DeepLabV3+)."""

    num_classes: int
    backbone_layers: tuple = (3, 4, 6, 3)
    rates: tuple = (12, 24, 36)
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    full_res_output: bool = True
    up_align_corners: bool = False
    output_stride: int = 8
    remat: bool = False
    aux: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = ResNet(block="bottleneck", layers=self.backbone_layers,
                          replace_stride_with_dilation=(False, True, True),
                          dtype=self.dtype, axis_name=self.axis_name,
                          remat=self.remat, name="backbone")(x, train=train)
        y = features[-1]  # 2048 @ os 8
        branches = [ConvNormAct(256, kernel_size=1, dtype=self.dtype,
                                axis_name=self.axis_name,
                                name="aspp_b0")(y, train=train)]
        for i, r in enumerate(self.rates):
            branches.append(
                ConvNormAct(256, kernel_size=3, dilation=r,
                            dtype=self.dtype, axis_name=self.axis_name,
                            name=f"aspp_b{i + 1}")(y, train=train))
        # global-pool branch: mean -> 1x1 CNA -> broadcast back (the
        # bilinear upsample of a 1x1 map IS a broadcast)
        p = y.mean(axis=(1, 2), keepdims=True)
        p = ConvNormAct(256, kernel_size=1, dtype=self.dtype,
                        axis_name=self.axis_name,
                        name="aspp_pool")(p, train=train)
        branches.append(jnp.broadcast_to(
            p, (y.shape[0], y.shape[1], y.shape[2], p.shape[-1])))
        y = jnp.concatenate(branches, axis=-1)  # 5 * 256 = 1280
        y = ConvNormAct(256, kernel_size=1, dtype=self.dtype,
                        axis_name=self.axis_name,
                        name="aspp_project")(y, train=train)
        y = ConvNormAct(256, kernel_size=3, dtype=self.dtype,
                        axis_name=self.axis_name, name="head")(y,
                                                               train=train)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=conv_kernel_init,
                    name="cls_conv")(y)
        if self.full_res_output:
            y = resize_bilinear(y, (8 * y.shape[1], 8 * y.shape[2]),
                                align_corners=False)
        if self.aux:
            a = _AuxHead(self.num_classes, self.dtype, self.axis_name,
                         name="aux_head")(features[3], train=train)
            if train:
                return y, a
        return y
