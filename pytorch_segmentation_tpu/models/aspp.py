"""ASPP — Atrous Spatial Pyramid Pooling (TPU-native rebuild of reference
models/aspp.py:8-37).

Branches: global-average-pool + 1×1 ConvNormAct broadcast back to the feature
map (the reference upsamples a 1×1 map bilinearly align_corners=False, which
is mathematically a broadcast — we broadcast directly, saving the resize);
a 1×1 ConvNormAct; and one 3×3 dilated ConvNormAct per atrous rate. Concat →
1×1 projection. All convs are MXU-friendly NHWC.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import ConvNormAct

__all__ = ["ASPP", "ASPPPooling"]


class ASPPPooling(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        y = y.astype(x.dtype)
        y = ConvNormAct(self.features, kernel_size=1, dtype=self.dtype,
                        axis_name=self.axis_name, name="gap_conv")(y, train=train)
        # bilinear upsample of a 1x1 map == broadcast (align_corners=False,
        # reference models/aspp.py:16-19)
        return jnp.broadcast_to(y, (y.shape[0], h, w, y.shape[-1]))


class ASPP(nn.Module):
    features: int
    atrous_rates: Sequence[int] = (12, 24, 36)
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = [
            ASPPPooling(self.features, dtype=self.dtype,
                        axis_name=self.axis_name, name="pool")(x, train=train),
            ConvNormAct(self.features, kernel_size=1, dtype=self.dtype,
                        axis_name=self.axis_name, name="conv1x1")(x, train=train),
        ]
        for i, rate in enumerate(self.atrous_rates):
            branches.append(
                ConvNormAct(self.features, kernel_size=3, dilation=rate,
                            dtype=self.dtype, axis_name=self.axis_name,
                            name=f"atrous{i}")(x, train=train))
        y = jnp.concatenate(branches, axis=-1)
        return ConvNormAct(self.features, kernel_size=1, dtype=self.dtype,
                           axis_name=self.axis_name, name="project")(y, train=train)
