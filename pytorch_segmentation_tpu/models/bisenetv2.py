"""BiSeNetV2 — a REAL-TIME model family BEYOND the reference
(WoodsGao/pytorch_segmentation ships UNet/DeepLabV3+/HRNet only; this is
the Bilateral Segmentation Network v2 of Yu et al., IJCV 2021, following
the mmsegmentation module conventions, built from the framework's own
blocks so every subsystem — fused Pallas loss/eval kernels via
full_res_output=False at output-stride 8, int8 PTQ, EMA/TTA, export,
remat — composes).

Trains FROM SCRATCH (no ImageNet backbone — the paper's design point),
which makes it the zoo's fastest serving family and the one with zero
porting dependencies.

Architecture (widths are the paper's alpha=1 config):
  - Detail branch: 3 conv stages (64, 64, 128), stride 8, shallow+wide —
    carries spatial detail.
  - Semantic branch: stem block (16ch, stride 4: strided-conv path +
    maxpool path, concat, fuse), gather-expansion (GE) stages
    (32, 64, 128) to stride 32, context-embedding block (GAP + BN + 1x1
    broadcast-add + 3x3) — carries context at a fraction of the FLOPs.
  - Bilateral Guided Aggregation (BGA): each branch gates the other at
    both resolutions (sigmoid attention), sum at stride 8, 3x3 fuse.
  - Seg head: 3x3 ConvNormAct 128->head_channels, 1x1 class conv, x8
    bilinear (align_corners=False, the mmseg convention).
  - Booster (aux=True): four FCN aux heads on the semantic-branch taps
    (stem s4, GE3 s8, GE4 s16, GE5 s32) with the paper's widening mid
    channels; train mode returns (logits, (aux2, aux3, aux4, aux5)) and
    the train step sums aux_weight * loss over the tuple
    (engine/steps.py — train-time only, eval sees one output).

GE layers use depthwise 3x3 convs with channel expansion
(feature_group_count=C_in, features=6*C_in) — on TPU these are
VPU/bandwidth ops, cheap at the semantic branch's low resolutions; the
MXU work stays in the 1x1 projections and the wide detail branch.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import BatchNorm2d, ConvNormAct, conv_kernel_init
from ..ops.resize import resize_bilinear

__all__ = ["BiSeNetV2"]


class _GELayer(nn.Module):
    """Gather-and-expansion layer (paper Fig. 5, mmseg GELayer): 3x3
    gather conv, depthwise 3x3 expansion (e=6), 1x1 linear projection,
    residual (depthwise-separable shortcut when strided), final ReLU."""

    cin: int
    cout: int
    stride: int = 1
    expand: int = 6
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.cin * self.expand

        def cna(ch, k, name, stride=1, groups=1, act=nn.relu):
            return ConvNormAct(ch, kernel_size=k, stride=stride,
                               groups=groups, activate=act,
                               dtype=self.dtype, axis_name=self.axis_name,
                               name=name)

        y = cna(self.cin, 3, "conv1")(x, train=train)
        if self.stride == 1:
            y = cna(mid, 3, "dwconv", groups=self.cin)(y, train=train)
            identity = x
        else:
            y = cna(mid, 3, "dwconv1", stride=self.stride,
                    groups=self.cin, act=None)(y, train=train)
            y = cna(mid, 3, "dwconv2", groups=mid)(y, train=train)
            identity = cna(self.cin, 3, "short_dw", stride=self.stride,
                           groups=self.cin, act=None)(x, train=train)
            identity = cna(self.cout, 1, "short_pw", act=None)(
                identity, train=train)
        y = cna(self.cout, 1, "conv2", act=None)(y, train=train)
        return nn.relu(y + identity)


class BiSeNetV2(nn.Module):
    num_classes: int
    detail_channels: tuple = (64, 64, 128)
    semantic_channels: tuple = (16, 32, 64, 128)
    expand: int = 6
    head_channels: int = 1024
    aux_channels: tuple = (16, 64, 256, 1024)
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    # full_res_output=False returns stride-8 logits, deferring the final
    # bilinear x8 into the fused loss/eval kernels — identical math.
    full_res_output: bool = True
    up_align_corners: bool = False
    output_stride: int = 8
    remat: bool = False
    # aux=True: the paper's booster — four auxiliary FCN heads on the
    # semantic-branch taps, train-time only (train.py --aux-loss W; the
    # paper uses W=1.0). Eval CLIs that rebuild without aux drop the
    # train-only params on load (engine/checkpoint.load_model_bundle).
    aux: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, c3 = self.detail_channels
        s1, s3, s4, s5 = self.semantic_channels

        def cna(ch, k, name, stride=1, groups=1, act=nn.relu):
            return ConvNormAct(ch, kernel_size=k, stride=stride,
                               groups=groups, activate=act,
                               dtype=self.dtype, axis_name=self.axis_name,
                               name=name)

        ge_cls = nn.remat(_GELayer, static_argnums=(2,)) if self.remat \
            else _GELayer

        def ge(cin, cout, name, stride=1):
            return ge_cls(cin, cout, stride=stride, expand=self.expand,
                          dtype=self.dtype, axis_name=self.axis_name,
                          name=name)

        # ---- detail branch: stride 8, wide/shallow ----
        d = cna(c1, 3, "detail1_0", stride=2)(x, train=train)
        d = cna(c1, 3, "detail1_1")(d, train=train)
        d = cna(c2, 3, "detail2_0", stride=2)(d, train=train)
        d = cna(c2, 3, "detail2_1")(d, train=train)
        d = cna(c2, 3, "detail2_2")(d, train=train)
        d = cna(c3, 3, "detail3_0", stride=2)(d, train=train)
        d = cna(c3, 3, "detail3_1")(d, train=train)
        d = cna(c3, 3, "detail3_2")(d, train=train)  # [B, H/8, W/8, 128]

        # ---- semantic branch: stem to stride 4 ----
        s = cna(s1, 3, "stem_conv", stride=2)(x, train=train)
        a = cna(s1 // 2, 1, "stem_left0")(s, train=train)
        a = cna(s1, 3, "stem_left1", stride=2)(a, train=train)
        b = nn.max_pool(s, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        s = cna(s1, 3, "stem_fuse")(jnp.concatenate([a, b], axis=-1),
                                    train=train)          # s4, 16ch
        tap2 = s
        s = ge(s1, s3, "ge3_0", stride=2)(s, train)
        s = ge(s3, s3, "ge3_1")(s, train)           # s8, 32ch
        tap3 = s
        s = ge(s3, s4, "ge4_0", stride=2)(s, train)
        s = ge(s4, s4, "ge4_1")(s, train)           # s16, 64ch
        tap4 = s
        s = ge(s4, s5, "ge5_0", stride=2)(s, train)
        s = ge(s5, s5, "ge5_1")(s, train)
        s = ge(s5, s5, "ge5_2")(s, train)
        s = ge(s5, s5, "ge5_3")(s, train)           # s32, 128ch
        tap5 = s

        # context embedding: GAP -> BN -> 1x1 CNA -> broadcast add -> 3x3
        g = jnp.mean(s.astype(jnp.float32), axis=(1, 2), keepdims=True)
        g = BatchNorm2d(dtype=self.dtype, axis_name=self.axis_name,
                        name="ce_bn")(g.astype(self.dtype),
                                      use_running_average=not train)
        g = cna(s5, 1, "ce_conv")(g, train=train)
        s = s + g  # broadcast over H, W
        s = cna(s5, 3, "ce_fuse")(s, train=train)

        # ---- bilateral guided aggregation (stride 8 out) ----
        # detail at s8: dw 3x3 BN + 1x1 (no BN/act) -> gated by semantic
        d_a = cna(c3, 3, "bga_d_dw", groups=c3, act=None)(d, train=train)
        d_a = nn.Conv(c3, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, kernel_init=conv_kernel_init,
                      name="bga_d_pw")(d_a)
        # detail downsampled to s32: 3x3 s2 BN + avgpool 3x3 s2
        d_b = cna(c3, 3, "bga_d_down", stride=2, act=None)(d, train=train)
        d_b = nn.avg_pool(d_b, (3, 3), strides=(2, 2),
                          padding=[(1, 1), (1, 1)])
        # semantic at s8: 3x3 BN -> x4 up -> sigmoid gate
        s_a = cna(c3, 3, "bga_s_conv", act=None)(s, train=train)
        s_a = resize_bilinear(s_a, d.shape[1:3], align_corners=False)
        # semantic at s32: dw 3x3 BN + 1x1 -> sigmoid gate
        s_b = cna(c3, 3, "bga_s_dw", groups=c3, act=None)(s, train=train)
        s_b = nn.Conv(c3, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, kernel_init=conv_kernel_init,
                      name="bga_s_pw")(s_b)
        left = d_a * nn.sigmoid(s_a.astype(jnp.float32)).astype(d_a.dtype)
        right = d_b * nn.sigmoid(s_b.astype(jnp.float32)).astype(d_b.dtype)
        right = resize_bilinear(right, d.shape[1:3], align_corners=False)
        y = cna(c3, 3, "bga_fuse")(left + right, train=train)  # s8, 128

        # ---- seg head ----
        y = cna(self.head_channels, 3, "head")(y, train=train)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=conv_kernel_init,
                    name="cls_conv")(y)
        if self.full_res_output:
            y = resize_bilinear(y, (8 * y.shape[1], 8 * y.shape[2]),
                                align_corners=self.up_align_corners)

        if self.aux:
            # booster heads: built unconditionally (params must exist from
            # the train=False init), returned in train mode only; logits
            # stay at each tap's stride — the loss resizes (ops/loss.py)
            auxs = []
            for i, (tap, mid) in enumerate(
                    zip((tap2, tap3, tap4, tap5), self.aux_channels)):
                a = cna(mid, 3, f"aux{i + 2}_conv")(tap, train=train)
                a = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32,
                            kernel_init=conv_kernel_init,
                            name=f"aux{i + 2}_cls")(a)
                # onto the main logits' grid, so every loss path (incl. the
                # fused Pallas kernel at full_res_output=False) sees aux
                # tensors shaped exactly like the main logits
                if a.shape[1:3] != y.shape[1:3]:
                    a = resize_bilinear(a, y.shape[1:3],
                                        align_corners=self.up_align_corners)
                auxs.append(a)
            if train:
                return y, tuple(auxs)
        return y
