"""Core NN building blocks (TPU-native rebuild of the `pytorch_modules.nn`
contract documented in SURVEY.md §2.9).

ConvNormAct == Conv2d(bias=False) + BatchNorm + ReLU, the workhorse block used
by every model in the reference (reference usage: models/aspp.py:27-30,
models/unet.py:19-22, models/hrnet.py passim). Design choices for TPU:

  - NHWC activations, HWIO kernels — XLA's native conv layout on TPU.
  - compute dtype bf16 / params f32 (AMP is the default numeric policy on
    TPU; replaces the reference's apex AMP, train.py:102-105).
  - BatchNorm keeps f32 statistics regardless of compute dtype, momentum 0.1
    in torch convention (flax momentum=0.9), eps 1e-5 — matching
    models/hrnet.py:14 BN_MOMENTUM.
  - optional `axis_name` enables cross-replica (sync) BN via psum over the
    data mesh axis.
  - explicit symmetric padding dilation*(k-1)//2 reproduces torch's
    Conv2d(padding=...) geometry exactly for every stride/dilation combo the
    models use ('SAME' would mis-align stride-2 convs).

Weight init follows `initialize_weights` (kaiming-normal fan-out for convs,
BN scale=1/bias=0) per SURVEY.md §2.9.
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ConvNormAct", "SeparableConvNormAct", "BatchNorm2d",
           "BatchNormFolded", "ConvStatsFolded", "fused_1x1_available",
           "set_force_fused_1x1", "set_conv1x1_dot", "set_quant_mode",
           "get_quant_mode", "conv_kernel_init", "BN_MOMENTUM"]

BN_MOMENTUM = 0.1  # torch convention; flax momentum = 1 - BN_MOMENTUM

# kaiming_normal_(mode='fan_out', nonlinearity='relu')
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _pad(kernel_size: int, dilation: int) -> int:
    return dilation * (kernel_size - 1) // 2


# Global default for BN statistic subsampling (see BatchNorm2d). Set via
# set_bn_stat_subsample() BEFORE building/tracing models; 1 = exact stats.
_DEFAULT_BN_SUBSAMPLE = 1


def set_bn_stat_subsample(s: int):
    global _DEFAULT_BN_SUBSAMPLE
    _DEFAULT_BN_SUBSAMPLE = max(1, int(s))


def get_bn_stat_subsample() -> int:
    return _DEFAULT_BN_SUBSAMPLE


class BatchNorm2d(nn.Module):
    """BatchNorm over (B, H, W) with torch semantics (momentum 0.1, eps
    1e-5, biased batch variance), param/stat names compatible with
    flax.linen.BatchNorm ('scale'/'bias' params, 'mean'/'var' stats).

    TPU note: profiling shows BN statistic reductions — not convolutions —
    dominate the train step (convert+reduce fusions ≈ 42% of step time at
    513², SURVEY perf work). `stat_subsample=s` computes batch statistics
    from every s-th pixel (still ~2M samples/channel at 513² bs32), cutting
    the reduction bandwidth s²x. s=1 is exact and the default; normalization
    itself always uses the full tensor.
    """

    momentum: float = BN_MOMENTUM  # torch convention
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    stat_subsample: int | None = None  # None -> module-level default

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            s = (self.stat_subsample if self.stat_subsample is not None
                 else _DEFAULT_BN_SUBSAMPLE)
            # never subsample tiny maps (late stages are cheap anyway)
            if min(x.shape[1], x.shape[2]) < 32 * s:
                s = 1
            xs = x[:, ::s, ::s, :] if s > 1 else x
            xf = xs.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            ex2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            if self.axis_name is not None:
                # cross-replica stats under shard_map (under plain pjit the
                # jnp.mean above is already global — leave axis_name unset)
                mean = jax.lax.pmean(mean, self.axis_name)
                ex2 = jax.lax.pmean(ex2, self.axis_name)
            # fast (one-pass) variance, like flax's use_fast_variance
            var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                # torch updates running_var with the UNBIASED batch variance
                # (normalization itself uses the biased one)
                n = jnp.asarray(xs.size // c, jnp.float32)
                if self.axis_name is not None:
                    # under shard_map x is the local shard: count globally
                    n = n * jax.lax.psum(1.0, self.axis_name)
                bessel = n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * (var * bessel))

        # fold stats into one per-channel scale+shift (f32), apply in the
        # compute dtype — a single fused multiply-add over the activations
        # at bf16 bandwidth instead of f32
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * inv
        y = x.astype(self.dtype) * inv.astype(self.dtype) \
            + shift.astype(self.dtype)
        return y


class BatchNormFolded(nn.Module):
    """BatchNorm whose batch statistics arrive as column sums (from a fused
    conv/matmul epilogue — ops/pallas/fused_matmul_bn.py) instead of being
    reduced from the activation tensor. Returns the per-channel folded
    (scale, shift) in f32 for the CONSUMER to apply — normalize itself fuses
    into the next op's prologue. Param/stat names identical to BatchNorm2d
    ('scale'/'bias' params, 'mean'/'var' stats), so checkpoints and the
    torch weight port are unaffected."""

    momentum: float = BN_MOMENTUM
    epsilon: float = 1e-5
    axis_name: str | None = None

    @nn.compact
    def __call__(self, col_sum, col_sumsq, n, use_running_average: bool):
        c = col_sum.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            mean = col_sum / n
            ex2 = col_sumsq / n
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                ex2 = jax.lax.pmean(ex2, self.axis_name)
            var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                # unbiased variance for the running update (torch semantics)
                nf = jnp.asarray(n, jnp.float32)
                if self.axis_name is not None:
                    nf = nf * jax.lax.psum(1.0, self.axis_name)
                bessel = nf / jnp.maximum(nf - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * (var * bessel))
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * inv
        return inv, shift


class _Kernel(nn.Module):
    """Bare conv-kernel param holder (path <name>/kernel) for layers whose
    matmul runs in a Pallas kernel instead of nn.Conv."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_kernel_init, self.shape,
                          jnp.float32)


_FORCE_FUSED_1X1 = None  # 'on' | 'off' | 'interpret' (tests) | None=default


def set_force_fused_1x1(mode):
    """None (default: off) | 'on' (opt-in) | 'interpret' (tests) | 'off'."""
    global _FORCE_FUSED_1X1
    _FORCE_FUSED_1X1 = mode


def fused_1x1_available() -> bool:
    """Whether ResNet/MobileNetV2 blocks route their 1x1 convs through the
    fused Pallas kernel (ops/pallas/fused_matmul_bn.py).

    DEFAULT OFF — measured negative result (PERF.md): despite the kernel
    winning isolated forward microbenches (1.3x), the end-to-end DLV3+ step
    drops 240 -> 155 img/s, because XLA already consumer-fuses the BN
    statistic reductions and normalize multiply-adds it replaces (same
    lesson as round-1's BN stat-subsampling), while the kernel's backward
    re-reads activations twice. Kept as `PSEG_FUSED_1X1=on` /
    set_force_fused_1x1('on') for future whole-block fusion work; only
    meaningful on a single TPU chip (no shard_map partitioning yet)."""
    if _FORCE_FUSED_1X1 == "interpret":
        return True
    if _FORCE_FUSED_1X1 == "on":
        return (jax.devices()[0].platform == "tpu"
                and jax.device_count() == 1)
    return False


class ConvStatsFolded(nn.Module):
    """Conv (no bias) producing RAW output + this layer's folded BN
    (scale, shift) for the consumer; consumes the PREVIOUS layer's raw
    output + fold. Same param tree as ConvNormAct ({conv/kernel, bn/*}).

    1x1 stride-1 on a single TPU chip: one fused Pallas pass
    (BN-apply + ReLU prologue, matmul, statistics epilogue) — the raw input
    is never normalized in HBM and the output is never re-read for
    statistics. Otherwise: explicit normalize + XLA conv + XLA statistic
    reduction (today's cost)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    # prologue activation == the PREVIOUS layer's nonlinearity:
    # 'relu' | 'relu6' | 'none'
    act_in: str = "relu"
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x_raw, in_scale, in_shift, train: bool = False):
        k = self.kernel_size
        cin = x_raw.shape[-1]
        n_rows = x_raw.size // cin  # B*H*W of the OUTPUT == input (stride 1)
        if (k == 1 and self.stride == 1 and self.groups == 1
                and fused_1x1_available() and not self.is_initializing()):
            from ..ops.pallas.fused_matmul_bn import fused_bn_act_matmul
            kernel = _Kernel((1, 1, cin, self.features), name="conv")()
            w2d = kernel.reshape(cin, self.features)
            y, s, ss = fused_bn_act_matmul(
                x_raw.astype(self.dtype), in_scale, in_shift,
                w2d.astype(self.dtype), act=self.act_in,
                interpret=_FORCE_FUSED_1X1 == "interpret")
        else:
            # XLA path: explicit BN-apply (bf16 folded multiply-add, same as
            # BatchNorm2d) + conv + statistic reduction
            cdt = self.dtype
            pre = (x_raw.astype(cdt) * in_scale.astype(cdt)
                   + in_shift.astype(cdt))
            if self.act_in == "relu":
                z = nn.relu(pre)
            elif self.act_in == "relu6":
                z = jnp.clip(pre, 0.0, jnp.asarray(6.0, cdt))
            else:
                z = pre
            if (k == 1 and self.stride == 1 and self.groups == 1
                    and not fused_1x1_available()):
                # keep the param path identical across platforms
                kernel = _Kernel((1, 1, cin, self.features), name="conv")()
                y = jax.lax.dot_general(
                    z.reshape(-1, cin), kernel.reshape(cin, self.features)
                    .astype(cdt), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cdt)
                y = y.reshape(x_raw.shape[:-1] + (self.features,))
            else:
                p = _pad(k, self.dilation)
                y = nn.Conv(self.features, kernel_size=(k, k),
                            strides=(self.stride, self.stride),
                            padding=[(p, p), (p, p)],
                            kernel_dilation=(self.dilation, self.dilation),
                            feature_group_count=self.groups,
                            use_bias=False, dtype=cdt,
                            param_dtype=jnp.float32,
                            kernel_init=conv_kernel_init, name="conv")(z)
                n_rows = y.size // self.features
            yf = y.astype(jnp.float32)
            s = jnp.sum(yf, axis=tuple(range(y.ndim - 1)))
            ss = jnp.sum(jnp.square(yf), axis=tuple(range(y.ndim - 1)))
        out_scale, out_shift = BatchNormFolded(
            axis_name=self.axis_name if train else None,
            name="bn")(s, ss, n_rows, use_running_average=not train)
        return y, out_scale, out_shift


# 1x1 convolutions as explicit dot_general — measured NULL result (default
# OFF): an interleaved same-process A/B on the bench config shows 0.999x
# (XLA already canonicalizes 1x1 conv_general_dilated to the same matmul
# emitters, forward and transpose). Kept as a switch for experiments; param
# tree is unchanged (kernel [1,1,K,M] at <name>/kernel) so checkpoints are
# compatible both ways. See tools/bench_ab.py.
_CONV1X1_DOT = False


def set_conv1x1_dot(on: bool):
    global _CONV1X1_DOT
    _CONV1X1_DOT = bool(on)


# int8 PTQ serving mode (see pytorch_segmentation_tpu/quant.py). Read at
# TRACE time (same pattern as set_conv1x1_dot / set_ce_bwd_mode); quant.py
# sets it inside the traced function body so every (re)trace sees it.
#   None      — normal bf16/f32 path
#   "calib"   — normal path + record per-block input abs-max into the
#               mutable "quant_stats" collection (per-tensor activation
#               scale calibration)
#   "int8"    — per-out-channel int8 weights x per-tensor int8 activations
#               (scale from calibrated quant_stats) -> int32 MXU conv ->
#               f32 rescale; BN(running stats) + act unchanged
#   "int8dyn" — same, but the activation scale is the live batch abs-max
#               (no calibration artifacts needed; one extra reduce/layer)
#   "qat"     — quantization-aware TRAINING: straight-through fake-quant of
#               the conv input + kernel with the same scale formulas as
#               "int8dyn", active only at train=True (the serving modes
#               above are active only at train=False). BN batch statistics
#               are computed on the fake-quantized conv outputs, so the
#               running stats the int8 serving path consumes match what it
#               actually computes — the main PTQ accuracy loss mechanism.
_QUANT_MODE = None

# Per-layer int8 gate: quantize only convs whose implicit-matmul contraction
# K = kh*kw*Cin is at least this. int8 pays on MXU-bound convs (deep
# contractions) and LOSES on floor-/bandwidth-bound ones (the quantize pass
# + int32 conv output add HBM bytes a short contraction can't buy back:
# un-gated UNet is 0.61x, HRNet 0.96x). Measured sweep on TPU v5e @512^2
# bs32 (tools/bench_quant_gate.py): K>=576 is the across-model optimum —
# UNet 1.02x (0.61x ungated; its sub-576 MobileNetV2 pointwise convs at
# large spatial were the poison), HRNet 1.18x (0.96x ungated; its
# K=576 convs are most of its win — 1152 drops to 1.03x), DLV3+ 1.22x
# (1.24x ungated; only the 7x7x3 stem gets gated off). Gating also
# IMPROVES accuracy (UNet mask agreement .9659 -> .9971). Calibration
# records stats for every eligible conv regardless, so the threshold can
# change without recalibrating.
_QUANT_MIN_K = 576


def set_quant_mode(mode):
    global _QUANT_MODE
    assert mode in (None, "calib", "int8", "int8dyn", "qat"), mode
    _QUANT_MODE = mode


def get_quant_mode():
    return _QUANT_MODE


def set_quant_min_k(min_k: int):
    """Set the int8 per-layer gate (trace-time, like set_quant_mode)."""
    global _QUANT_MIN_K
    _QUANT_MIN_K = int(min_k)


def get_quant_min_k():
    return _QUANT_MIN_K


class ConvNormAct(nn.Module):
    """Conv2d(bias=False) + BatchNorm2d + activation (default ReLU)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    activate: Callable | None = nn.relu  # None => no activation (hrnet.py:217)
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None  # set to mesh axis for cross-replica BN

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        p = _pad(k, self.dilation)
        # int8 quantization: grouped/depthwise convs stay bf16 (floor-bound
        # and not validated int8). The serving modes (calib/int8/int8dyn)
        # apply only at train=False; "qat" only at train=True (eval under a
        # QAT-mode trace runs the plain path — eval/serving choose their own
        # quantization via make_eval_step(quant=)/make_quant_mask_fn).
        quant = _QUANT_MODE if self.groups == 1 else None
        if (quant == "qat") != train:
            quant = None
        if quant in ("int8", "int8dyn", "qat") and \
                k * k * x.shape[-1] < _QUANT_MIN_K:
            quant = None  # floor-/bandwidth-bound conv: int8 loses (gate ^)
        if quant == "calib":
            stat = self.variable("quant_stats", "in_absmax",
                                 lambda: jnp.zeros((), jnp.float32))
            if not self.is_initializing():
                stat.value = jnp.maximum(
                    stat.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
        if quant == "qat":
            # Quantization-aware training: straight-through fake-quant of
            # the conv input and kernel with the SAME scale formulas as the
            # int8 serving branch below (symmetric per-tensor activation /
            # per-out-channel weight abs-max), so the training loss sees
            # serving's quantization error while round/clip pass gradients
            # through unchanged (STE). Scales are stop-gradiented live
            # abs-maxes (the "int8dyn" scheme); the conv itself runs in the
            # normal compute dtype. docs/QUANTIZATION.md.
            kernel = _Kernel((k, k, x.shape[-1], self.features),
                             name="conv")()
            xf = x.astype(jnp.float32)
            s_x = jnp.maximum(jax.lax.stop_gradient(jnp.max(jnp.abs(xf))),
                              1e-6) / 127.0
            x_dq = jnp.clip(jnp.round(xf / s_x), -127, 127) * s_x
            xf = xf + jax.lax.stop_gradient(x_dq - xf)
            s_w = jnp.maximum(
                jnp.max(jnp.abs(jax.lax.stop_gradient(kernel)),
                        axis=(0, 1, 2)), 1e-8) / 127.0
            w_dq = jnp.clip(jnp.round(kernel / s_w), -127, 127) * s_w
            w = kernel + jax.lax.stop_gradient(w_dq - kernel)
            x = jax.lax.conv_general_dilated(
                xf.astype(self.dtype), w.astype(self.dtype),
                (self.stride, self.stride), [(p, p), (p, p)],
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        elif quant in ("int8", "int8dyn"):
            # raw kernel param at the ConvNormAct path (<name>/conv/kernel)
            # — checkpoint-compatible with the nn.Conv branches below
            kernel = _Kernel((k, k, x.shape[-1], self.features),
                             name="conv")()
            if quant == "int8":
                amax = self.variable("quant_stats", "in_absmax",
                                     lambda: jnp.zeros((), jnp.float32)
                                     ).value
            else:
                amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
            # symmetric per-tensor activation scale (0.0 -> 0 exactly, so
            # conv zero-padding is exact); guard uncalibrated/all-zero
            s_x = jnp.maximum(amax, 1e-6) / 127.0
            x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                           -127, 127).astype(jnp.int8)
            # symmetric per-OUT-CHANNEL weight scales over (H, W, I)
            s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)),
                              1e-8) / 127.0
            w_q = jnp.clip(jnp.round(kernel / s_w), -127,
                           127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                x_q, w_q, (self.stride, self.stride), [(p, p), (p, p)],
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            x = (y.astype(jnp.float32) * (s_x * s_w)).astype(self.dtype)
        elif k == 1 and self.groups == 1 and _CONV1X1_DOT:
            # exact: a 1x1/pad-0 conv ignores strided-away positions
            kernel = _Kernel((1, 1, x.shape[-1], self.features),
                             name="conv")()
            if self.stride > 1:
                x = x[:, ::self.stride, ::self.stride, :]
            cin = x.shape[-1]
            y = jax.lax.dot_general(
                x.astype(self.dtype).reshape(-1, cin),
                kernel.reshape(cin, self.features).astype(self.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(self.dtype)
            x = y.reshape(x.shape[:-1] + (self.features,))
        else:
            x = nn.Conv(
                self.features,
                kernel_size=(k, k),
                strides=(self.stride, self.stride),
                padding=[(p, p), (p, p)],
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=conv_kernel_init,
                name="conv",
            )(x)
        x = BatchNorm2d(
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            name="bn",
        )(x, use_running_average=not train)
        if self.activate is not None:
            x = self.activate(x)
        return x


class SeparableConvNormAct(nn.Module):
    """Depthwise-separable ConvNormAct (pytorch_modules.nn contract; imported
    at reference models/aspp.py:5). Depthwise k×k + BN + ReLU, then pointwise
    1×1 + BN + ReLU."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    activate: Callable | None = nn.relu
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        x = ConvNormAct(
            in_features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            groups=in_features,
            activate=self.activate,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="depthwise",
        )(x, train=train)
        x = ConvNormAct(
            self.features,
            kernel_size=1,
            activate=self.activate,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="pointwise",
        )(x, train=train)
        return x
