"""Fused eval-confusion kernel vs the XLA path (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from pytorch_segmentation_tpu.ops.metrics import confusion_update
from pytorch_segmentation_tpu.ops.pallas.eval_confusion import fused_eval_confusion
from pytorch_segmentation_tpu.ops.resize import resize_bilinear


def _reference(logits, labels, valid, align):
    up = resize_bilinear(jnp.asarray(logits), labels.shape[1:3],
                         align_corners=align)
    pred = np.asarray(jnp.argmax(up, axis=-1))
    tp = np.zeros(logits.shape[-1])
    fn = np.zeros_like(tp)
    fp = np.zeros_like(tp)
    for i in range(valid):
        t, f, p = confusion_update(jnp.asarray(pred[i]),
                                   jnp.asarray(labels[i]),
                                   logits.shape[-1])
        tp += np.asarray(t)
        fn += np.asarray(f)
        fp += np.asarray(p)
    return tp, fn, fp


def test_fused_eval_matches_reference(rng):
    logits = rng.standard_normal((3, 16, 16, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (3, 64, 64)).astype(np.int32)
    for valid in (3, 2):
        tp, fn, fp = fused_eval_confusion(jnp.asarray(logits),
                                          jnp.asarray(labels), valid,
                                          align_corners=True, tile=16,
                                          interpret=True)
        rtp, rfn, rfp = _reference(logits, labels, valid, True)
        np.testing.assert_array_equal(np.asarray(tp), rtp)
        np.testing.assert_array_equal(np.asarray(fn), rfn)
        np.testing.assert_array_equal(np.asarray(fp), rfp)


def test_fused_eval_ragged_rows(rng):
    logits = rng.standard_normal((1, 11, 13, 3)).astype(np.float32)
    labels = rng.integers(0, 3, (1, 50, 52)).astype(np.int32)
    tp, fn, fp = fused_eval_confusion(jnp.asarray(logits),
                                      jnp.asarray(labels), 1,
                                      align_corners=False, tile=16,
                                      interpret=True)
    rtp, rfn, rfp = _reference(logits, labels, 1, False)
    np.testing.assert_array_equal(np.asarray(tp), rtp)
    # total pixels counted == H*W (padding excluded)
    assert (np.asarray(tp) + np.asarray(fn)).sum() == 50 * 52
    np.testing.assert_array_equal(np.asarray(fp), rfp)


def test_fused_eval_extended_classes(rng):
    """65..128-class range (COCO-81): confusion counts at 81 classes match
    the XLA reference (interpret mode)."""
    logits = rng.standard_normal((2, 8, 8, 81)).astype(np.float32)
    labels = rng.integers(0, 81, (2, 16, 16)).astype(np.int32)
    tp, fn, fp = fused_eval_confusion(jnp.asarray(logits),
                                      jnp.asarray(labels), 2,
                                      interpret=True)
    rtp, rfn, rfp = _reference(logits, labels, 2, True)
    np.testing.assert_array_equal(np.asarray(tp), rtp)
    np.testing.assert_array_equal(np.asarray(fn), rfn)
    np.testing.assert_array_equal(np.asarray(fp), rfp)
