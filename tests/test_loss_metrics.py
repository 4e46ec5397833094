"""Loss vs torch reference semantics (utils/utils.py:17-24) and metric
zero-guard parity (utils/utils.py:51-65)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from pytorch_segmentation_tpu.ops.loss import (compute_loss, focal_bce_loss,
                                               lovasz_softmax_loss,
                                               softmax_cross_entropy)
from pytorch_segmentation_tpu.ops.metrics import (compute_metrics,
                                                  confusion_update)


def test_compute_loss_matches_torch(rng):
    logits = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    targets = rng.integers(0, 4, (2, 16, 16)).astype(np.int64)
    ours = float(compute_loss(jnp.asarray(logits), jnp.asarray(targets)))
    t_logits = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    t_up = F.interpolate(t_logits, (16, 16), mode="bilinear",
                         align_corners=True)
    ref = float(F.cross_entropy(t_up, torch.from_numpy(targets)))
    assert abs(ours - ref) < 1e-5


def test_ce_ignore_index(rng):
    logits = rng.standard_normal((8, 3)).astype(np.float32)
    labels = np.array([0, 1, 2, 0, 1, 2, 255, 255])
    ours = float(softmax_cross_entropy(jnp.asarray(logits),
                                       jnp.asarray(labels), ignore_index=255))
    ref = float(F.cross_entropy(torch.from_numpy(logits),
                                torch.from_numpy(labels), ignore_index=255))
    assert abs(ours - ref) < 1e-5


def test_confusion_update_matches_loop(rng):
    nc = 5
    pred = rng.integers(0, nc, (2, 16, 16))
    target = rng.integers(0, nc, (2, 16, 16))
    tp, fn, fp = confusion_update(jnp.asarray(pred), jnp.asarray(target), nc)
    # reference per-class loop (test.py:38-46)
    p, t = pred.reshape(-1), target.reshape(-1)
    for c in range(nc):
        tpi = int(((p == c) & (t == c)).sum())
        fni = int((t == c).sum()) - tpi
        fpi = int((p == c).sum()) - tpi
        assert int(tp[c]) == tpi
        assert int(fn[c]) == fni
        assert int(fp[c]) == fpi


def test_compute_metrics_zero_guards():
    # class with zero union: miou 0/1 = 0 (reference zero-guard)
    tp = np.array([5.0, 0.0])
    fn = np.array([2.0, 0.0])
    fp = np.array([3.0, 0.0])
    T, P, R, miou, F1 = compute_metrics(tp, fn, fp)
    assert float(miou[0]) == 5.0 / 10.0
    assert float(miou[1]) == 0.0
    assert float(P[1]) == 0.0 and float(R[1]) == 0.0 and float(F1[1]) == 0.0
    assert float(T[0]) == 7.0
    assert abs(float(F1[0]) - 2 * 5 / (2 * 5 + 3 + 2)) < 1e-6


def test_focal_and_lovasz_finite(rng):
    logits = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (2, 8, 8)))
    onehot = jax.nn.one_hot(labels, 3)
    f = float(focal_bce_loss(logits, onehot))
    l = float(lovasz_softmax_loss(logits, labels))
    assert np.isfinite(f) and f > 0
    assert np.isfinite(l) and 0 <= l <= 1
