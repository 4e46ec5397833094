"""Pallas TPU kernel: fused bilinear-upsample + argmax — the serving path.

The predict/serving hot path (reference utils/inference.py:8-21 upsamples
logits and argmaxes them) naively materializes the full-res logits tensor
([32, 513, 513, 21] f32 ≈ 700 MB for the benchmark config) just to reduce
it to an int mask. This kernel streams row-tiles and classes (same
structure as ops/pallas/eval_confusion.py — strictly 2-D MXU contractions
per class, online argmax) and emits the [B, H, W] int32 mask directly:
8.4 MB out instead of 700 MB through HBM.

Numerics: identical interpolation weights as ops/resize.py (shared
_interp_weights via softmax_ce._prep machinery); ties resolve to the
lowest class id, matching jnp.argmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .softmax_ce import (_NEG_BIG, _interp_weights, _pad_rows,
                         _upsample_class)

__all__ = ["fused_upsample_argmax"]


def _argmax_kernel(logits_ref, mh_ref, mw_ref, out_ref, *, num_classes: int):
    mh = mh_ref[...]                    # [tile, h]
    mw = mw_ref[...]                    # [W, w]
    tile, w_out = out_ref.shape[1], out_ref.shape[2]

    # online argmax over classes (ties -> lowest class id, like jnp.argmax)
    m = jnp.full((tile, w_out), _NEG_BIG, jnp.float32)
    pred = jnp.zeros((tile, w_out), jnp.int32)
    for c in range(num_classes):
        up_c = _upsample_class(logits_ref[0, c], mh, mw)
        pred = jnp.where(up_c > m, c, pred)
        m = jnp.maximum(m, up_c)
    out_ref[0] = pred


def fused_upsample_argmax(logits, out_hw, align_corners: bool = True,
                          tile: int = 128, interpret: bool = False):
    """logits [B, h, w, C] (any float dtype) -> argmax of the bilinearly
    upsampled logits at `out_hw`, int32 [B, *out_hw]. Never materializes
    the upsampled logits tensor.
    """
    b, hh, ww, cc = logits.shape
    assert cc <= 128, "argmax kernel supports <=128 classes"
    from .softmax_ce import default_tile
    tile = min(tile, default_tile(cc))  # VMEM headroom
    h_out, w_out = out_hw
    mh = jnp.asarray(_pad_rows(_interp_weights(hh, h_out, align_corners),
                               tile))
    mw = jnp.asarray(_interp_weights(ww, w_out, align_corners))
    logits_cm = jnp.transpose(logits, (0, 3, 1, 2))  # [B, C, h, w]
    n_tiles = mh.shape[0] // tile

    def run():
        return pl.pallas_call(
            functools.partial(_argmax_kernel, num_classes=cc),
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec((1, cc, hh, ww), lambda bi, ti: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, hh), lambda bi, ti: (ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile, w_out),
                                   lambda bi, ti: (bi, ti, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, mh.shape[0], w_out),
                                           jnp.int32),
        )(logits_cm, mh, mw)

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            pred = run()
    else:
        pred = run()
    return pred[:, :h_out, :]
