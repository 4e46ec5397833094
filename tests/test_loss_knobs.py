"""CE trainer knobs (ops/loss.weighted_cross_entropy): class weights and
label smoothing golden-checked against torch.nn.functional.cross_entropy,
OHEM semantics brute-forced in numpy, and build_loss composition rules."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pytorch_segmentation_tpu.ops.loss import (build_loss, compute_loss,
                                               weighted_cross_entropy)


def _logits_labels(b=2, h=9, w=11, c=5, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, h, w, c).astype(np.float32) * 3.0
    labels = rng.randint(0, c, (b, h, w)).astype(np.int32)
    return logits, labels


def _torch_ce(logits, labels, weight=None, label_smoothing=0.0,
              ignore_index=-100):
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)  # NCHW
    tt = torch.from_numpy(labels.astype(np.int64))
    wt = None if weight is None else torch.tensor(weight)
    return float(F.cross_entropy(lt, tt, weight=wt,
                                 label_smoothing=label_smoothing,
                                 ignore_index=ignore_index))


def test_plain_matches_torch_and_default():
    logits, labels = _logits_labels()
    ours = float(weighted_cross_entropy(jnp.asarray(logits),
                                        jnp.asarray(labels)))
    assert abs(ours - _torch_ce(logits, labels)) < 1e-5
    # knob-free weighted CE == the reference softmax CE path
    ref = float(compute_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(ours - ref) < 1e-5


def test_class_weights_match_torch():
    logits, labels = _logits_labels(seed=1)
    w = [0.5, 2.0, 1.0, 0.1, 3.0]
    ours = float(weighted_cross_entropy(jnp.asarray(logits),
                                        jnp.asarray(labels),
                                        class_weights=jnp.asarray(w)))
    assert abs(ours - _torch_ce(logits, labels, weight=w)) < 1e-5


def test_label_smoothing_matches_torch():
    logits, labels = _logits_labels(seed=2)
    ours = float(weighted_cross_entropy(jnp.asarray(logits),
                                        jnp.asarray(labels),
                                        label_smoothing=0.1))
    assert abs(ours - _torch_ce(logits, labels, label_smoothing=0.1)) < 1e-5


def test_weights_and_smoothing_compose_like_torch():
    logits, labels = _logits_labels(seed=3)
    w = [1.0, 0.25, 2.0, 1.5, 0.75]
    ours = float(weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels),
        class_weights=jnp.asarray(w), label_smoothing=0.2))
    ref = _torch_ce(logits, labels, weight=w, label_smoothing=0.2)
    assert abs(ours - ref) < 1e-5


def test_ignore_index_with_weights():
    logits, labels = _logits_labels(seed=4)
    labels = labels.copy()
    labels[0, :3] = 255
    w = [0.5, 2.0, 1.0, 0.1, 3.0]
    ours = float(weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels),
        class_weights=jnp.asarray(w), ignore_index=255))
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tt = torch.from_numpy(labels.astype(np.int64))
    ref = float(F.cross_entropy(lt, tt, weight=torch.tensor(w),
                                ignore_index=255))
    assert abs(ours - ref) < 1e-5


def test_ohem_semantics_bruteforce():
    """kept = p_true <= max(thresh, k-th smallest p_true), k = frac*N;
    loss = mean CE over kept (mmseg OhemPixelSampler's dynamic
    'lower the threshold until min_kept' rule, realized static-shape)."""
    logits, labels = _logits_labels(b=1, h=8, w=8, c=5, seed=5)
    frac, thresh = 0.25, 0.3
    ours = float(weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels),
        ohem_frac=frac, ohem_thresh=thresh))
    # numpy brute force
    z = logits.reshape(-1, 5).astype(np.float64)
    y = labels.reshape(-1)
    lse = np.log(np.exp(z).sum(-1))
    ce = lse - z[np.arange(len(y)), y]
    p = np.exp(-ce)
    k = max(1, int(frac * len(y)))
    kth = np.sort(p)[k - 1]
    kept = p <= max(thresh, kth)
    assert kept.sum() >= k
    ref = ce[kept].mean()
    assert abs(ours - ref) < 1e-5


def test_ohem_thresh_dominates_when_many_hard():
    """With a high threshold most pixels are kept — OHEM must then be
    (nearly) the plain mean over the sub-threshold set, not just top-k."""
    logits, labels = _logits_labels(b=1, h=8, w=8, c=5, seed=6)
    ours = float(weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels),
        ohem_frac=0.01, ohem_thresh=1.1))  # keep everything
    ref = float(weighted_cross_entropy(jnp.asarray(logits),
                                       jnp.asarray(labels)))
    assert abs(ours - ref) < 1e-6


def test_build_loss_knobs():
    logits, labels = _logits_labels(seed=7)
    # knob-free build stays the fused-path default
    assert build_loss("ce") is compute_loss
    fn = build_loss("ce", class_weights=[0.5, 2.0, 1.0, 0.1, 3.0],
                    label_smoothing=0.1)
    v = float(fn(jnp.asarray(logits), jnp.asarray(labels)))
    ref = _torch_ce(logits, labels, weight=[0.5, 2.0, 1.0, 0.1, 3.0],
                    label_smoothing=0.1)
    assert abs(v - ref) < 1e-5
    # the CE component of combination losses picks up the knobs
    fn2 = build_loss("ce+dice", label_smoothing=0.1)
    v2 = float(fn2(jnp.asarray(logits), jnp.asarray(labels)))
    assert np.isfinite(v2) and v2 != v
    # losses with no CE term reject the knobs
    with pytest.raises(ValueError):
        build_loss("dice", label_smoothing=0.1)
    with pytest.raises(ValueError):
        build_loss("lovasz", ohem_frac=0.1)


def test_build_loss_upsamples_low_res_logits():
    """Deferred-upsample models hand the custom CE low-res logits; the
    knob path must upsample to label resolution first (same as the other
    non-default losses)."""
    rng = np.random.RandomState(8)
    logits = jnp.asarray(rng.randn(2, 5, 5, 4).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, (2, 20, 20)).astype(np.int32))
    fn = build_loss("ce", label_smoothing=0.05)
    assert np.isfinite(float(fn(logits, labels)))
