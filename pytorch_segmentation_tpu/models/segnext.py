"""SegNeXt (Guo et al., NeurIPS 2022) — a model family BEYOND the
reference (WoodsGao/pytorch_segmentation ships UNet/DeepLabV3+/HRNet only),
following the paper's architecture and mmsegmentation module conventions
(inner module names mirror mmseg's mscan.py/ham_head.py — proj_1,
spatial_gating_unit, conv0_1.., fc1/dwconv/fc2 — so an mmseg checkpoint
port is mostly stage-prefix renaming).

Why this family fits TPUs: the encoder's "attention" is multi-scale
convolutional gating (MSCA) — depthwise 5x5 + three strip-conv pairs
(1x7/7x1, 1x11/11x1, 1x21/21x1) summed and gated through a 1x1 — i.e.
VPU elementwise + MXU matmul work with zero softmax/attention memory
traffic, and the decoder (LightHam) is a few batched MXU matmuls iterated
a fixed number of steps.

Encoder (MSCAN):
  - stem: 3x3 s2 conv+BN+GELU -> 3x3 s2 conv+BN (stride 4)
  - stages joined by 3x3 s2 conv+BN overlap patch embeds
  - block: x += ls1 * SpatialAtt(BN(x));  x += ls2 * MixFFN(BN(x))
    SpatialAtt = 1x1 -> GELU -> MSCA gate -> 1x1, + shortcut
    MixFFN     = 1x1 -> DW 3x3 -> GELU -> 1x1
    ls* are per-channel layer scales (init 1e-2)
  - LayerNorm at each stage end (channels-last: native in NHWC)

Decoder (LightHamHead) on the stride-8/16/32 taps, resized to stride 8
(align_corners=False) and concatenated:
  squeeze 1x1+GN+ReLU -> Hamburger -> align 1x1+GN+ReLU -> 1x1 cls -> x8
  Hamburger = 1x1 -> ReLU -> NMF2D -> 1x1+GN, ReLU(x + out)
  NMF2D: rank-R non-negative matrix factorization of the [N, D] feature
  map by multiplicative updates (6 steps train / 7 eval, Ham paper
  defaults), entirely batched matmuls; run in f32 for stability. The
  backward is the Ham ONE-STEP GRADIENT: the update iterations are a
  stop-gradient region and only the final coef update differentiates
  (mmseg runs local_inference under no_grad) — see nmf2d.

Documented deviations (framework conventions + determinism):
  - stochastic regularizers omitted (drop-path 0.1 / head dropout 0.1),
    like every family here (models/segformer.py header);
  - mmseg's NMF re-randomizes its bases EVERY forward (rand_init=True),
    making inference non-deterministic; here the bases are a fixed
    column-normalized uniform sample (np.random.RandomState(1), a module
    constant both the model and the parity mirror share) — the NMF is
    robust to init (Ham paper §4.2) and serving becomes reproducible.

Variants (paper Table 7 / mmseg configs): mscan-t/s/b; "tiny" is NOT a
paper variant — 1-block stages at test widths for affordable 1-core
compiles.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import BatchNorm2d, ConvNormAct, conv_kernel_init
from ..ops.resize import resize_bilinear

__all__ = ["SegNeXt", "MSCAN_VARIANTS"]

# depths, dims, ffn expansion ratios, ham/decoder channels, NMF rank
MSCAN_VARIANTS = {
    "tiny": ((1, 1, 1, 1), (16, 24, 32, 48), (4, 4, 2, 2), 32, 8),
    "t": ((3, 3, 5, 2), (32, 64, 160, 256), (8, 8, 4, 4), 256, 64),
    "s": ((2, 2, 4, 2), (64, 128, 320, 512), (8, 8, 4, 4), 256, 64),
    "b": ((3, 3, 12, 3), (64, 128, 320, 512), (8, 8, 4, 4), 512, 64),
}


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)  # torch nn.GELU default


def _conv(ch, k, name, stride=1, groups=1, dtype=jnp.bfloat16):
    """Raw conv (bias=True, torch Conv2d default) with torch same-padding;
    k may be (kh, kw) for the MSCA strip convs."""
    kh, kw = (k, k) if isinstance(k, int) else k
    return nn.Conv(ch, (kh, kw), strides=(stride, stride),
                   padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
                   feature_group_count=groups, dtype=dtype,
                   param_dtype=jnp.float32, kernel_init=conv_kernel_init,
                   name=name)


class _Scale(nn.Module):
    """Per-channel layer scale; param named 'scale' so the torch mirror's
    1-D `weight` ports through convert_named."""
    dim: int
    init: float = 1e-2

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(self.init),
                       (self.dim,), jnp.float32)
        return s.astype(x.dtype) * x


class _MSCA(nn.Module):
    """Multi-Scale Convolutional Attention gate (mmseg MSCAAttention):
    DW 5x5, plus 7/11/21 strip-conv branch pairs summed, 1x1 mix, then
    elementwise-multiplies the input."""
    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d, dt = self.dim, self.dtype
        attn = _conv(d, 5, "conv0", groups=d, dtype=dt)(x)
        a0 = _conv(d, (1, 7), "conv0_1", groups=d, dtype=dt)(attn)
        a0 = _conv(d, (7, 1), "conv0_2", groups=d, dtype=dt)(a0)
        a1 = _conv(d, (1, 11), "conv1_1", groups=d, dtype=dt)(attn)
        a1 = _conv(d, (11, 1), "conv1_2", groups=d, dtype=dt)(a1)
        a2 = _conv(d, (1, 21), "conv2_1", groups=d, dtype=dt)(attn)
        a2 = _conv(d, (21, 1), "conv2_2", groups=d, dtype=dt)(a2)
        attn = attn + a0 + a1 + a2
        attn = _conv(d, 1, "conv3", dtype=dt)(attn)
        return attn * x


class _SpatialAttention(nn.Module):
    """mmseg MSCASpatialAttention: 1x1 -> GELU -> MSCA -> 1x1, +shortcut."""
    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = _conv(self.dim, 1, "proj_1", dtype=self.dtype)(x)
        x = _gelu(x)
        x = _MSCA(self.dim, dtype=self.dtype,
                  name="spatial_gating_unit")(x)
        x = _conv(self.dim, 1, "proj_2", dtype=self.dtype)(x)
        return x + shortcut


class _Block(nn.Module):
    """MSCAN block: BN -> spatial attention (+ls1), BN -> MixFFN (+ls2)."""
    dim: int
    mlp_ratio: int
    layer_scale: float = 1e-2
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = BatchNorm2d(dtype=self.dtype, axis_name=self.axis_name,
                        name="norm1")(x, use_running_average=not train)
        h = _SpatialAttention(self.dim, dtype=self.dtype, name="attn")(h)
        x = x + _Scale(self.dim, self.layer_scale,
                       name="layer_scale_1")(h)
        h = BatchNorm2d(dtype=self.dtype, axis_name=self.axis_name,
                        name="norm2")(x, use_running_average=not train)
        hidden = self.dim * self.mlp_ratio
        h = _conv(hidden, 1, "fc1", dtype=self.dtype)(h)
        h = _conv(hidden, 3, "dwconv", groups=hidden, dtype=self.dtype)(h)
        h = _gelu(h)
        h = _conv(self.dim, 1, "fc2", dtype=self.dtype)(h)
        return x + _Scale(self.dim, self.layer_scale,
                          name="layer_scale_2")(h)


class MSCAN(nn.Module):
    """Encoder trunk: returns the four stage taps at strides 4/8/16/32."""
    depths: tuple = (3, 3, 5, 2)
    dims: tuple = (32, 64, 160, 256)
    mlp_ratios: tuple = (8, 8, 4, 4)
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = nn.remat(_Block, static_argnums=(2,)) if self.remat \
            else _Block
        x = x.astype(self.dtype)
        taps = []
        for s, (depth, dim, ratio) in enumerate(
                zip(self.depths, self.dims, self.mlp_ratios)):
            if s == 0:
                x = ConvNormAct(dim // 2, kernel_size=3, stride=2,
                                activate=_gelu, dtype=self.dtype,
                                axis_name=self.axis_name,
                                name="stem1")(x, train=train)
                x = ConvNormAct(dim, kernel_size=3, stride=2,
                                activate=None, dtype=self.dtype,
                                axis_name=self.axis_name,
                                name="stem2")(x, train=train)
            else:
                x = ConvNormAct(dim, kernel_size=3, stride=2,
                                activate=None, dtype=self.dtype,
                                axis_name=self.axis_name,
                                name=f"embed{s}")(x, train=train)
            for b in range(depth):
                x = block_cls(dim, ratio, dtype=self.dtype,
                              axis_name=self.axis_name,
                              name=f"stage{s}_block{b}")(x, train)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name=f"stage{s}_norm")(x)
            taps.append(x)
        return tuple(taps)


def nmf_bases(dim: int, rank: int) -> np.ndarray:
    """The shared deterministic NMF init: column-normalized uniform
    sample from a FIXED seed (see module docstring — replaces mmseg's
    per-forward rand_init so inference is reproducible; the torch parity
    mirror calls this same function)."""
    b = np.random.RandomState(1).rand(dim, rank).astype(np.float32)
    return b / np.linalg.norm(b, axis=0, keepdims=True)


def nmf2d(x, rank: int, steps: int, eps: float = 1e-6):
    """Rank-`rank` NMF of non-negative x [B, H, W, D] by multiplicative
    updates (Lee & Seung; Ham paper NMF2D). All work is batched MXU
    matmuls in f32.

    Gradient semantics are the Ham paper's ONE-STEP GRADIENT (its §3.3;
    mmseg runs local_inference under torch.no_grad()): the `steps`
    update iterations are a stop-gradient region, and the backward flows
    only through the single final coef update + reconstruction —
    backprop through the MU iterations is unstable and pays `steps`
    extra matmul chains of memory for nothing.
    """
    b_, h, w, d = x.shape
    dtype = x.dtype
    xf = x.reshape(b_, h * w, d).astype(jnp.float32)
    bases = jnp.broadcast_to(jnp.asarray(nmf_bases(d, rank)),
                             (b_, d, rank))

    def coef_update(xin, coef, bases):
        num = jnp.einsum("bnd,bdr->bnr", xin, bases)
        den = jnp.einsum("bns,bsr->bnr", coef,
                         jnp.einsum("bds,bdr->bsr", bases, bases))
        return coef * num / (den + eps)

    def body(_, bc):
        bases, coef = bc
        coef = coef_update(xs, coef, bases)
        num = jnp.einsum("bnd,bnr->bdr", xs, coef)
        den = jnp.einsum("bds,bsr->bdr", bases,
                         jnp.einsum("bns,bnr->bsr", coef, coef))
        bases = bases * num / (den + eps)
        return bases, coef

    xs = jax.lax.stop_gradient(xf)
    coef = jax.nn.softmax(jnp.einsum("bnd,bdr->bnr", xs, bases), axis=-1)
    bases, coef = jax.lax.fori_loop(0, steps, body, (bases, coef))
    bases = jax.lax.stop_gradient(bases)
    coef = coef_update(xf, jax.lax.stop_gradient(coef), bases)
    out = jnp.einsum("bdr,bnr->bnd", bases, coef)
    return out.reshape(b_, h, w, d).astype(dtype)


class _Hamburger(nn.Module):
    """ham_in 1x1 -> ReLU -> NMF2D -> ham_out 1x1+GN; ReLU(x + out)."""
    channels: int
    rank: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        steps = 6 if train else 7  # Ham train/eval_steps defaults
        h = _conv(self.channels, 1, "ham_in", dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nmf2d(h, self.rank, steps)
        h = nn.Conv(self.channels, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=conv_kernel_init, name="ham_out")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="ham_out_gn")(h)
        return nn.relu(x + h)


class _GNConv(nn.Module):
    """1x1 conv (no bias) + GroupNorm(32) + ReLU (mmseg ConvModule with
    GN norm_cfg)."""
    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=conv_kernel_init, name="conv")(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="gn")(x)
        return nn.relu(x)


class SegNeXt(nn.Module):
    """`--model segnext [--variant tiny/t/s/b]`. Logits at stride 8
    (LightHam head over the stride-8/16/32 taps), trailing x8 bilinear
    (align_corners=False) unless full_res_output=False defers it into the
    fused loss/eval kernels."""
    num_classes: int
    variant: str = "t"
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    full_res_output: bool = True
    remat: bool = False
    up_align_corners: bool = False  # mmseg align_corners=False everywhere

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths, dims, ratios, ham_ch, rank = MSCAN_VARIANTS[self.variant]
        in_hw = (x.shape[1], x.shape[2])
        taps = MSCAN(depths=depths, dims=dims, mlp_ratios=ratios,
                     dtype=self.dtype, axis_name=self.axis_name,
                     remat=self.remat, name="backbone")(x, train=train)
        # LightHamHead consumes the stride-8/16/32 taps at stride 8
        base_hw = (taps[1].shape[1], taps[1].shape[2])
        feats = [taps[1]] + [
            resize_bilinear(t, base_hw, align_corners=False) for t in taps[2:]
        ]
        y = jnp.concatenate(feats, axis=-1)
        y = _GNConv(ham_ch, dtype=self.dtype, name="squeeze")(y)
        y = _Hamburger(ham_ch, rank, dtype=self.dtype,
                       name="hamburger")(y, train=train)
        y = _GNConv(ham_ch, dtype=self.dtype, name="align")(y)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32,
                         kernel_init=conv_kernel_init,
                         name="cls_conv")(y).astype(jnp.float32)
        if self.full_res_output:
            logits = resize_bilinear(logits, in_hw, align_corners=False)
        return logits
