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

jpu=True (registered in the zoo as 'fastfcn') swaps the dilated backbone
for a normally-strided one + FastFCN Joint Pyramid Upsampling — see the
field comment below and PERF.md for the measured speedup.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..nn.backbones.resnet import ResNet
from ..nn.blocks import ConvNormAct, SeparableConvNormAct, conv_kernel_init
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
    # jpu=True replaces the dilated os=8 backbone with a normally-strided
    # (os=32) backbone + Joint Pyramid Upsampling (FastFCN, Wu et al. 2019,
    # arxiv 1903.11816): layer2/3/4 taps -> 3x3 CNA 512 each -> bilinear
    # upsample to os 8 -> concat (1536) -> four parallel 3x3 separable CNAs
    # at dilations 1/2/4/8 -> concat (2048), a drop-in for the dilated
    # layer4 output the PPM head consumes. Approximates the dilated
    # feature map at a fraction of the FLOPs (layer3/4 run at 1/4 and 1/16
    # of the dilated spatial area) — measured on-chip in PERF.md.
    jpu: bool = False
    # aux=True adds the canonical PSPNet/FastFCN auxiliary FCN head on
    # layer3 (3x3 CNA 256 -> 1x1 class conv at the backbone's layer3
    # stride); in train mode __call__ returns (logits, aux_logits) and the
    # train step adds aux_weight * the selected training loss on the aux
    # branch (train.py --aux-loss W; with the default --loss ce, W=0.4 is
    # the hszhao/semseg convention). Train-time only:
    # eval/serving/export see the single-output graph, and eval CLIs that
    # rebuild the model without aux drop the train-only params on load
    # (engine/checkpoint.load_model_bundle).
    aux: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dil = (False, False, False) if self.jpu else (False, True, True)
        features = ResNet(block="bottleneck", layers=self.backbone_layers,
                          replace_stride_with_dilation=dil,
                          dtype=self.dtype, axis_name=self.axis_name,
                          remat=self.remat,
                          name="backbone")(x, train=train)
        if self.jpu:
            taps = []
            for i, name in ((2, "jpu_conv2"), (3, "jpu_conv3"),
                            (4, "jpu_conv4")):
                t = ConvNormAct(512, kernel_size=3, dtype=self.dtype,
                                axis_name=self.axis_name,
                                name=name)(features[i], train=train)
                taps.append(t)
            size = (taps[0].shape[1], taps[0].shape[2])  # os 8
            taps = [taps[0]] + [resize_bilinear(t, size, align_corners=True)
                                for t in taps[1:]]
            cat = jnp.concatenate(taps, axis=-1)  # 1536 @ os 8
            y = jnp.concatenate(
                [SeparableConvNormAct(512, kernel_size=3, dilation=d,
                                      dtype=self.dtype,
                                      axis_name=self.axis_name,
                                      name=f"jpu_dil{d}")(cat, train=train)
                 for d in (1, 2, 4, 8)], axis=-1)  # 2048 @ os 8
        else:
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
        if self.aux:
            # params must exist from the train=False init, so the head is
            # built unconditionally (tiny: one 3x3 + one 1x1 on layer3);
            # only train mode returns it
            a = ConvNormAct(256, kernel_size=3, dtype=self.dtype,
                            axis_name=self.axis_name,
                            name="aux_conv")(features[3], train=train)
            a = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32,
                        kernel_init=conv_kernel_init, name="aux_cls")(a)
            if train:
                return y, a
        return y
