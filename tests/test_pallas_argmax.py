"""Fused upsample+argmax kernel vs the XLA path (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from pytorch_segmentation_tpu.ops.pallas.upsample_argmax import (
    fused_upsample_argmax)
from pytorch_segmentation_tpu.ops.resize import resize_bilinear


def _reference(logits, out_hw, align):
    up = resize_bilinear(jnp.asarray(logits), out_hw, align_corners=align)
    return np.asarray(jnp.argmax(up, axis=-1).astype(jnp.int32))


def test_fused_argmax_matches_reference(rng):
    logits = rng.standard_normal((3, 16, 16, 5)).astype(np.float32)
    for align in (True, False):
        pred = fused_upsample_argmax(jnp.asarray(logits), (64, 64),
                                     align_corners=align, tile=16,
                                     interpret=True)
        assert pred.shape == (3, 64, 64) and pred.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(pred),
                                      _reference(logits, (64, 64), align))


def test_fused_argmax_ragged_rows(rng):
    # output rows not a multiple of the tile: padded rows must be sliced off
    logits = rng.standard_normal((2, 11, 13, 3)).astype(np.float32)
    pred = fused_upsample_argmax(jnp.asarray(logits), (50, 52),
                                 align_corners=False, tile=16,
                                 interpret=True)
    assert pred.shape == (2, 50, 52)
    np.testing.assert_array_equal(np.asarray(pred),
                                  _reference(logits, (50, 52), False))


def test_fused_argmax_bf16_and_wide_classes(rng):
    # bf16 logits (the TPU hot path) + >32 classes (tile clamp branch)
    logits = rng.standard_normal((1, 8, 8, 40)).astype(np.float32)
    lb = jnp.asarray(logits, jnp.bfloat16)
    pred = fused_upsample_argmax(lb, (32, 32), align_corners=True,
                                 interpret=True)
    # reference on the same bf16->f32 upcast values
    np.testing.assert_array_equal(
        np.asarray(pred),
        _reference(np.asarray(lb.astype(jnp.float32)), (32, 32), True))


def test_fused_argmax_extended_classes(rng):
    """65..128-class range (COCO-81): the forward argmax kernel at 81
    classes matches the XLA reference (interpret mode)."""
    logits = rng.standard_normal((1, 8, 8, 81)).astype(np.float32)
    pred = fused_upsample_argmax(jnp.asarray(logits), (16, 16),
                                 align_corners=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(pred),
                                  _reference(logits, (16, 16), True))
