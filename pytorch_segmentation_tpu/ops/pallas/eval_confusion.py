"""Pallas TPU kernel: fused bilinear-upsample + argmax + per-class confusion.

The eval loop (reference test.py:26-46) needs, per batch: upsampled logits ->
argmax -> per-class tp/fn/fp. The naive path materializes the full-res
logits tensor ([32, 513, 513, 21] f32 ≈ 700 MB for the benchmark config).
This kernel streams row-tiles and classes (same structure as
ops/pallas/softmax_ce.py — strictly 2-D matmuls, class-major logits,
online argmax) and emits per-sample confusion vectors directly.

Output layout: [B, 8, 128] f32 per sample — rows 0/1/2 hold tp/fn/fp over
the first `num_classes` lanes (8x128 is the minimum legal VMEM tile). The
wrapper slices rows and masks padded samples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .softmax_ce import _NEG_BIG, _common_in_specs, _prep, _upsample_class

__all__ = ["fused_eval_confusion"]


def _eval_kernel(logits_ref, labels_ref, mh_ref, mw_ref, out_ref, *,
                 tile: int, h_out: int, num_classes: int):
    mh = mh_ref[...]
    mw = mw_ref[...]
    labels = labels_ref[0]              # [tile, W]
    w_out = labels.shape[1]

    # online argmax over classes (ties -> lowest class id, like jnp.argmax)
    m = jnp.full((tile, w_out), _NEG_BIG, jnp.float32)
    pred = jnp.zeros((tile, w_out), jnp.int32)
    for c in range(num_classes):
        up_c = _upsample_class(logits_ref[0, c], mh, mw)
        take = up_c > m
        pred = jnp.where(take, c, pred)
        m = jnp.maximum(m, up_c)

    ti = pl.program_id(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, w_out), 0)
    valid = (row_ids + ti * tile) < h_out

    @pl.when(ti == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    acc = jnp.zeros((1, 8, 128), jnp.float32)
    for c in range(num_classes):
        pc = (pred == c) & valid
        lc = (labels == c) & valid
        tp = jnp.sum((pc & lc).astype(jnp.float32))
        fn = jnp.sum(lc.astype(jnp.float32)) - tp
        fp = jnp.sum(pc.astype(jnp.float32)) - tp
        here = lane == c
        acc = acc + jnp.where(here & (sub == 0), tp, 0.0)
        acc = acc + jnp.where(here & (sub == 1), fn, 0.0)
        acc = acc + jnp.where(here & (sub == 2), fp, 0.0)
    out_ref[...] += acc


def fused_eval_confusion(logits, labels, valid, align_corners: bool = True,
                         tile: int = 128, interpret: bool = False):
    """logits [B, h, w, C] (h <= H), labels [B, H, W] int, valid = number of
    real samples (scalar) or a per-sample bool mask [B]. Returns (tp, fn, fp)
    f32 [C] with padded samples excluded.
    """
    num_classes = logits.shape[-1]
    assert num_classes <= 128, "confusion kernel supports <=128 classes"
    from .softmax_ce import default_tile
    tile = min(tile, default_tile(num_classes))  # VMEM headroom
    h_out, w_out = labels.shape[1], labels.shape[2]
    # keep the model's native dtype through the transpose: the per-tile
    # bf16->f32 upcast inside _upsample_class is exact, at half the traffic
    b, hh, ww, cc = logits.shape
    mh, mw, labels_p = _prep(hh, ww, labels, (h_out, w_out), align_corners,
                             tile)
    logits_cm = jnp.transpose(logits, (0, 3, 1, 2))
    n_tiles = mh.shape[0] // tile

    def run():
        # pallas_call must be constructed inside force_tpu_interpret_mode
        # for the interpret flag to take effect
        return pl.pallas_call(
            functools.partial(_eval_kernel, tile=tile, h_out=h_out,
                              num_classes=num_classes),
            grid=(b, n_tiles),
            in_specs=_common_in_specs(hh, ww, cc, tile, w_out),
            out_specs=pl.BlockSpec((1, 8, 128), lambda bi, ti: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        )(logits_cm, labels_p, mh, mw)

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            per_sample = run()
    else:
        per_sample = run()

    valid = jnp.asarray(valid)
    mask = (jnp.arange(b) < valid) if valid.ndim == 0 else valid.astype(bool)
    sample_mask = mask.astype(jnp.float32)[:, None]
    counts = jnp.sum(per_sample[:, :3, :num_classes]
                     * sample_mask[..., None], axis=0)  # [3, C]
    return counts[0], counts[1], counts[2]
