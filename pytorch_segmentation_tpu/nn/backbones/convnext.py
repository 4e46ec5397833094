"""ConvNeXt backbone (Liu et al., CVPR 2022 — "A ConvNet for the 2020s"),
torchvision-faithful so real `convnext_tiny/small/base` classification
checkpoints port 1:1 (utils/port_torch.convert_convnext).

Structure (torchvision `features.*` indexing):
  - stem: 4x4 conv stride 4 + LayerNorm (features.0)
  - 4 stages of CNBlocks (features.1/3/5/7), joined by LayerNorm + 2x2
    stride-2 conv downsamples (features.2/4/6)
  - CNBlock: depthwise 7x7 (with bias) -> LayerNorm -> Linear 4C -> GELU
    (exact) -> Linear C -> per-channel layer-scale gamma (init 1e-6) ->
    residual

Returns the four stage outputs at strides 4/8/16/32 — exactly the
C2..C5 contract UPerNet's head consumes (models/upernet.py
encoder='convnext'). All LayerNorms are channels-last (native in NHWC —
torchvision needs a custom LayerNorm2d + two Permutes per block; here
the layout is already right, so every op is layout-free for XLA).

Deviations, both documented per this framework's convention: stochastic
depth (drop-path) is omitted like every stochastic regularizer here
(models/segformer.py header), and no extra per-tap LayerNorms are added
(mmseg's ConvNeXt inserts norm0..norm3 for its heads; UPerNet's lateral
ConvNormActs already re-normalize each tap, and omitting them keeps the
trunk bit-portable from torchvision classification weights).

TPU notes: the depthwise 7x7 is a VPU op (cheap at the deep stages' low
resolutions); the FLOPs sit in the 1x1 Linears, which are MXU matmuls
over the lane-aligned channel dim. bf16 compute / f32 params; LN moments
in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..blocks import conv_kernel_init

__all__ = ["ConvNeXt", "CONVNEXT_VARIANTS"]

# depths, dims (paper Table; torchvision convnext_tiny/small/base)
CONVNEXT_VARIANTS = {
    # "pico" is NOT a paper variant: 1-block stages at tiny widths for
    # affordable 1-core test compiles (all structure intact)
    "pico": ((1, 1, 1, 1), (16, 32, 64, 128)),
    "t": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "s": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "b": ((3, 3, 27, 3), (128, 256, 512, 1024)),
}


class _CNBlock(nn.Module):
    dim: int
    layer_scale: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), feature_group_count=self.dim,
                    padding=3, dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=conv_kernel_init, name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)  # torch nn.GELU default
        h = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(h)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale),
            (self.dim,), jnp.float32)
        return x + gamma.astype(h.dtype) * h


class ConvNeXt(nn.Module):
    """Returns (x1, x2, x3, x4) at strides 4/8/16/32, dims per variant."""

    depths: tuple = (3, 3, 9, 3)
    dims: tuple = (96, 192, 384, 768)
    layer_scale: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = nn.remat(_CNBlock) if self.remat else _CNBlock
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        conv = lambda ch, k, s, name: nn.Conv(
            ch, (k, k), strides=(s, s), padding="VALID", dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=conv_kernel_init,
            name=name)

        x = x.astype(self.dtype)
        x = conv(self.dims[0], 4, 4, "stem_conv")(x)
        x = ln("stem_norm")(x)
        taps = []
        for s, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if s > 0:
                x = ln(f"down{s}_norm")(x)
                x = conv(dim, 2, 2, f"down{s}_conv")(x)
            for b in range(depth):
                x = block_cls(dim, layer_scale=self.layer_scale,
                              dtype=self.dtype,
                              name=f"stage{s}_block{b}")(x)
            taps.append(x)
        return tuple(taps)
