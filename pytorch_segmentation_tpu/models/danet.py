"""DANet (dual attention) — a model family BEYOND the reference
(WoodsGao/pytorch_segmentation ships UNet/DeepLabV3+/HRNet only; this is
Fu et al. CVPR 2019, "Dual Attention Network for Scene Segmentation",
mmseg DAHead conventions), built from the same framework blocks so every
subsystem — fused Pallas loss/eval kernels, deferred upsample, int8 PTQ,
EMA/TTA, export, porting — composes.

Architecture: ResNet at output-stride 8 (layer3+4 dilated, reference
resnet contract nn/backbones/resnet.py), then two parallel attention
branches over the 2048ch layer4 map, each entered through a 3x3
ConvNormAct 2048->512:

  - PAM (position attention): 1x1 query/key projections to C/8=64 and a
    1x1 value projection to 512 (plain biased convs, mmseg
    _SelfAttentionBlock with norm/act off); attention =
    softmax_j(q_i . k_j) over the N=H*W positions; out = attn @ value;
    a zero-initialized learned scalar gates the residual
    (gamma * out + x). One [N, N] MXU matmul pair per image — at os=8
    512^2 that is N=4096, squarely in MXU territory.
  - CAM (channel attention): attention over the 512 CHANNELS of the
    branch input itself (no projections): energy[i, j] = x_i . x_j over
    positions, the paper's max-subtraction trick
    (softmax of rowmax(energy) - energy), out = attn @ x, zero-init
    scalar residual gate.

Each branch closes with a 3x3 ConvNormAct 512->512; the fused output is
their SUM -> 1x1 class conv -> x8 bilinear upsample
(align_corners=False, the mmseg convention). `aux=True` returns the
paper's per-branch classifiers (pam_cls, cam_cls) as auxiliary heads in
train mode (the DAHead trains all three outputs against the target;
train.py --aux-loss W weights the branch terms).

TPU notes: attention matmuls run in bf16 on the MXU; softmaxes in f32
(the models/segformer.py convention). The head dropout of the paper is
omitted (BN regularizes; keeps eval == train graph shape, the
models/pspnet.py convention). Deterministic, static-shaped throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.backbones.resnet import ResNet
from ..nn.blocks import ConvNormAct, conv_kernel_init
from ..ops.resize import resize_bilinear
from .segnext import _Scale

__all__ = ["DANet"]


def _proj(ch: int, dtype, name: str):
    """Plain biased 1x1 conv (mmseg PAM query/key/value projections:
    ConvModule with norm_cfg=None, act_cfg=None)."""
    return nn.Conv(ch, (1, 1), use_bias=True, dtype=dtype,
                   param_dtype=jnp.float32, kernel_init=conv_kernel_init,
                   name=name)


class DANet(nn.Module):
    num_classes: int
    backbone_layers: tuple = (3, 4, 6, 3)  # ResNet-50
    channels: int = 512
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    # full_res_output=False returns stride-8 logits, deferring the final
    # bilinear x8 into the fused loss/eval kernels — identical math.
    full_res_output: bool = True
    up_align_corners: bool = False  # mmseg danet convention
    output_stride: int = 8
    remat: bool = False
    # aux=True adds the paper's per-branch classifiers: train-mode
    # forward returns (fused_logits, (pam_logits, cam_logits)) and the
    # train step adds aux_weight * loss on each branch (train.py
    # --aux-loss W). Train-time only: eval/serving/export see the
    # single-output graph and eval CLIs drop the train-only params.
    aux: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = ResNet(block="bottleneck", layers=self.backbone_layers,
                          replace_stride_with_dilation=(False, True, True),
                          dtype=self.dtype, axis_name=self.axis_name,
                          remat=self.remat,
                          name="backbone")(x, train=train)
        y = features[-1]  # 2048ch @ stride 8 (dilated)
        ch = self.channels

        # --- position attention branch ---------------------------------
        p = ConvNormAct(ch, kernel_size=3, dtype=self.dtype,
                        axis_name=self.axis_name,
                        name="pam_in")(y, train=train)
        b, h, w, _ = p.shape
        n = h * w
        q = _proj(ch // 8, self.dtype, "pam_query")(p).reshape(
            b, n, ch // 8)
        k = _proj(ch // 8, self.dtype, "pam_key")(p).reshape(b, n, ch // 8)
        v = _proj(ch, self.dtype, "pam_value")(p).reshape(b, n, ch)

        def _pam_attn(q, k, v):
            scores = jnp.einsum("bnc,bmc->bnm", q, k)  # bf16 MXU
            attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            return jnp.einsum("bnm,bmc->bnc", attn.astype(v.dtype), v)

        if self.remat:
            # the [B,N,N] scores/softmax (N=4096 at 512^2 os=8: ~1 GB of
            # f32 per bs32 batch) dominate this family's memory — remat
            # recomputes them in the backward instead of saving them
            # (param-free segment, so plain jax.checkpoint applies)
            _pam_attn = jax.checkpoint(_pam_attn)
        ctx = _pam_attn(q, k, v)
        p = _Scale(1, 0.0, name="pam_gamma")(ctx.reshape(b, h, w, ch)) + p
        p = ConvNormAct(ch, kernel_size=3, dtype=self.dtype,
                        axis_name=self.axis_name,
                        name="pam_out")(p, train=train)

        # --- channel attention branch ----------------------------------
        c = ConvNormAct(ch, kernel_size=3, dtype=self.dtype,
                        axis_name=self.axis_name,
                        name="cam_in")(y, train=train)
        cf = c.reshape(b, n, ch)

        def _cam_attn(cf):
            energy = jnp.einsum("bni,bnj->bij", cf, cf).astype(jnp.float32)
            # the paper's stability trick: softmax of rowmax - energy (NOT
            # a plain max-shifted softmax — it REVERSES the ordering, so
            # the weakest-correlated channel gets the largest weight;
            # reproduced exactly, it is part of the published architecture)
            energy = jnp.max(energy, axis=-1, keepdims=True) - energy
            cattn = jax.nn.softmax(energy, axis=-1)
            return jnp.einsum("bij,bnj->bni", cattn.astype(cf.dtype), cf)

        if self.remat:
            _cam_attn = jax.checkpoint(_cam_attn)
        cctx = _cam_attn(cf)
        c = _Scale(1, 0.0, name="cam_gamma")(cctx.reshape(b, h, w, ch)) + c
        c = ConvNormAct(ch, kernel_size=3, dtype=self.dtype,
                        axis_name=self.axis_name,
                        name="cam_out")(c, train=train)

        # --- fuse + classify -------------------------------------------
        def _cls(t, name, upsample=True):
            t = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32,
                        kernel_init=conv_kernel_init, name=name)(t)
            if self.full_res_output and upsample:
                t = resize_bilinear(t, (8 * t.shape[1], 8 * t.shape[2]),
                                    align_corners=self.up_align_corners)
            return t

        out = _cls(p + c, "cls_conv")
        if self.aux:
            # params must exist from the train=False init, so both branch
            # classifiers are built unconditionally (two 1x1 convs);
            # only train mode returns them. Aux logits stay at stride 8
            # (the pspnet/fcn aux convention — compute_loss resizes to
            # label resolution anyway; materializing full-res aux logit
            # tensors + grads buys nothing)
            pam_y = _cls(p, "pam_cls", upsample=False)
            cam_y = _cls(c, "cam_cls", upsample=False)
            if train:
                return out, (pam_y, cam_y)
        return out
