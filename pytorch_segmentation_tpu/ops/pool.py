"""Adaptive average pooling (torch.nn.AdaptiveAvgPool2d semantics).

Output cell (i, j) averages the input window
[floor(i*H/k), ceil((i+1)*H/k)) x [floor(j*W/k), ceil((j+1)*W/k)) — exactly
torch's boundaries, so ported weights see identical pyramid features.

TPU-native: output grids here are tiny and static (PSPNet bins 1/2/3/6),
so each cell is one static-shape slice + mean that XLA fuses; no dynamic
shapes, no ragged windows at trace time.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["adaptive_avg_pool2d"]


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """x: [B, H, W, C] -> [B, kh, kw, C] (means over torch-adaptive
    windows). kh/kw must be static Python ints."""
    h, w = int(x.shape[1]), int(x.shape[2])
    kh, kw = int(out_hw[0]), int(out_hw[1])
    rows = []
    for i in range(kh):
        h0, h1 = (i * h) // kh, -(-((i + 1) * h) // kh)
        cols = []
        for j in range(kw):
            w0, w1 = (j * w) // kw, -(-((j + 1) * w) // kw)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)
