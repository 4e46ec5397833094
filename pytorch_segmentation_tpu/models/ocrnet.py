"""OCRNet — Object-Contextual Representations over HRNet, a model family
BEYOND the reference (WoodsGao/pytorch_segmentation ships
UNet/DeepLabV3+/HRNet only; this is Yuan et al., ECCV 2020, following the
mmsegmentation OCRHead/FCNHead cascade conventions, built from the
framework's own blocks so every subsystem — fused Pallas loss/eval kernels
via full_res_output=False at output-stride 4, int8 PTQ, EMA/TTA, export —
composes).

Pairs with the zoo's existing HRNet family: the backbone is
models/hrnet.py with feature_output=True (HRNetV2 representation — every
branch of the last stage upsampled onto branch 0 and concatenated,
sum(channels) = 480 at width 32), so `--model ocrnet` upgrades an HRNet
user's decoder without changing the trunk.

Head (mmseg `OCRHead` + cascade `FCNHead`, channels 512 / key 256):
  1. Soft object regions: a 1-conv FCN head on the concat features
     predicts coarse per-class logits (`aux_conv` 1x1 CNA + `aux_cls`).
     These are INTEGRAL to the forward pass (they weight the gather), so
     the params always exist; `aux=True` additionally RETURNS them in
     train mode for deep supervision (train.py --aux-loss W — the paper
     uses W=0.4).
  2. Spatial gather: softmax the region logits over PIXELS; each class's
     distribution weight-sums the 512-ch pixel features (`bottleneck`
     3x3 CNA) into one object-region vector -> [B, K, 512].
  3. Object attention (mmseg ObjectAttentionBlock): pixels query the K
     region vectors — query/key are 2-conv 1x1 CNA stacks to 256ch,
     value/out 1-conv each, scaled dot-product softmax over K, then a
     1x1 CNA `fuse` of concat(context, pixels) -> 512.
  4. `cls_conv` 1x1 + x4 bilinear upsample (align_corners=False).

The attention is two MXU-friendly batched matmuls ([B, HW, 256] x
[B, 256, K] with K = num_classes); on TPU everything stays in one fused
program — region vectors never leave the chip. The 1x1 CNAs on the
[B, K, 1, C] region tensor batch-normalize over the region axis exactly
like mmseg's ConvModule on [B, C, K, 1].
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import ConvNormAct, conv_kernel_init
from ..ops.resize import resize_bilinear
from .hrnet import HRNet

__all__ = ["OCRNet"]


class OCRNet(nn.Module):
    num_classes: int
    ocr_channels: int = 512   # pixel/object representation width
    key_channels: int = 256   # query/key/value width (mmseg ocr_channels)
    num_branches_list: Sequence[int] = (2, 3, 4)
    base_channels: int = 32   # HRNet width (w18/w48 via --variant)
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    # full_res_output=False returns stride-4 logits, deferring the final
    # bilinear x4 into the fused loss/eval kernels — identical math.
    full_res_output: bool = True
    up_align_corners: bool = False
    output_stride: int = 4
    # aux=True returns the soft-region logits as an auxiliary output in
    # train mode (cascade deep supervision). The region head's params
    # exist either way — the OCR gather needs them in every mode.
    aux: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = HRNet(num_classes=1,  # unused: feature_output skips the head
                      num_branches_list=self.num_branches_list,
                      base_channels=self.base_channels,
                      feature_output=True, dtype=self.dtype,
                      axis_name=self.axis_name,
                      name="backbone")(x, train=train)

        def cna(ch, k, name):
            return ConvNormAct(ch, kernel_size=k, dtype=self.dtype,
                               axis_name=self.axis_name, name=name)

        # 1. soft object regions (mmseg FCNHead: num_convs=1, kernel=1,
        #    channels == in_channels, concat_input=False)
        a = cna(feats.shape[-1], 1, "aux_conv")(feats, train=train)
        aux_logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                             param_dtype=jnp.float32,
                             kernel_init=conv_kernel_init,
                             name="aux_cls")(a)

        # 2. pixel representations + spatial gather
        pix = cna(self.ocr_channels, 3, "bottleneck")(feats, train=train)
        b, h, w, c = pix.shape
        k = self.num_classes
        probs = jax.nn.softmax(
            aux_logits.astype(jnp.float32).reshape(b, h * w, k), axis=1)
        regions = jnp.einsum("bpk,bpc->bkc", probs.astype(pix.dtype),
                             pix.reshape(b, h * w, c))
        regions4 = regions.reshape(b, k, 1, c)  # NHWC, spatial = (K, 1)

        # 3. object attention (ObjectAttentionBlock: 2-conv query/key
        #    projections, 1-conv value/out, matmul_norm scaling)
        q = cna(self.key_channels, 1, "query0")(pix, train=train)
        q = cna(self.key_channels, 1, "query1")(q, train=train)
        kk = cna(self.key_channels, 1, "key0")(regions4, train=train)
        kk = cna(self.key_channels, 1, "key1")(kk, train=train)
        v = cna(self.key_channels, 1, "value")(regions4, train=train)
        sim = jnp.einsum(
            "bpc,bkc->bpk",
            q.reshape(b, h * w, self.key_channels).astype(jnp.float32),
            kk.reshape(b, k, self.key_channels).astype(jnp.float32))
        attn = jax.nn.softmax(sim * self.key_channels ** -0.5, axis=-1)
        ctx = jnp.einsum("bpk,bkc->bpc", attn.astype(pix.dtype),
                         v.reshape(b, k, self.key_channels))
        ctx = ctx.reshape(b, h, w, self.key_channels)
        ctx = cna(self.ocr_channels, 1, "out_project")(ctx, train=train)
        y = cna(self.ocr_channels, 1, "fuse")(
            jnp.concatenate([ctx, pix], axis=-1), train=train)

        # 4. classifier + x4 (mmseg align_corners=False)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=conv_kernel_init,
                    name="cls_conv")(y)
        if self.full_res_output:
            y = resize_bilinear(y, (4 * y.shape[1], 4 * y.shape[2]),
                                align_corners=self.up_align_corners)
            if self.aux and train:
                aux_logits = resize_bilinear(
                    aux_logits, y.shape[1:3],
                    align_corners=self.up_align_corners)
        if self.aux and train:
            return y, aux_logits
        return y
