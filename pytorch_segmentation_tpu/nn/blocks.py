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

__all__ = ["ConvNormAct", "SeparableConvNormAct", "conv_kernel_init", "BN_MOMENTUM"]

BN_MOMENTUM = 0.1  # torch convention; flax momentum = 1 - BN_MOMENTUM

# kaiming_normal_(mode='fan_out', nonlinearity='relu')
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _pad(kernel_size: int, dilation: int) -> int:
    return dilation * (kernel_size - 1) // 2


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
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - BN_MOMENTUM,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.axis_name if train else None,
            name="bn",
        )(x)
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
