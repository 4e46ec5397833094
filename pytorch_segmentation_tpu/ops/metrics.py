"""Streaming segmentation metrics, computed on-device.

Replaces the reference's per-class Python loop with `.item()` host syncs
(reference: test.py:38-46) with a single jitted confusion-vector update:
tp/fn/fp are accumulated as device arrays inside the eval step and only
materialised on the host once per evaluation. Under a data-parallel mesh the
vectors are `psum`-reduced across devices — the exact semantics of the
reference's `dist.all_reduce(SUM)` on tp/fn/fp (reference: test.py:51-57).

`compute_metrics` reproduces reference utils/utils.py:51-65 including its
zero-guard behaviour (guards replace non-positive denominators with 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["confusion_update", "compute_metrics"]


def confusion_update(pred: jax.Array, target: jax.Array, num_classes: int):
    """Per-class (tp, fn, fp) counts for one batch.

    pred/target: integer arrays of identical shape (any rank).
    Returns three f32 vectors of length num_classes.
    Implemented as one bincount over target*C+pred — a single scatter-add the
    TPU executes on-device, no host round-trips.
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    target = target.reshape(-1).astype(jnp.int32)
    idx = target * num_classes + pred
    cm = jnp.bincount(idx, length=num_classes * num_classes)
    cm = cm.reshape(num_classes, num_classes).astype(jnp.float32)
    tp = jnp.diagonal(cm)
    fn = jnp.sum(cm, axis=1) - tp  # target == c, pred != c
    fp = jnp.sum(cm, axis=0) - tp  # pred == c, target != c
    return tp, fn, fp


def compute_metrics(tp, fn, fp):
    """(T, P, R, miou, F1) per class with the reference's zero-guards
    (utils/utils.py:51-65)."""
    tp = jnp.asarray(tp, dtype=jnp.float32)
    fn = jnp.asarray(fn, dtype=jnp.float32)
    fp = jnp.asarray(fp, dtype=jnp.float32)
    union = tp + fp + fn
    union = jnp.where(union <= 0, 1.0, union)
    miou = tp / union
    T = tp + fn
    P = jnp.where((tp + fp) <= 0, 1.0, tp + fp)
    P = tp / P
    R = jnp.where((tp + fn) <= 0, 1.0, tp + fn)
    R = tp / R
    F1 = 2 * tp + fp + fn
    F1 = jnp.where(F1 <= 0, 1.0, F1)
    F1 = 2 * tp / F1
    return T, P, R, miou, F1
