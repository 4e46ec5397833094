"""Loss vs torch reference semantics (utils/utils.py:17-24) and metric
zero-guard parity (utils/utils.py:51-65)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
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


def test_build_loss_ce_is_reference_loss():
    from pytorch_segmentation_tpu.ops.loss import build_loss, compute_loss
    # identity matters: the Trainer swaps in the fused deferred-upsample
    # path only for the default loss (trainer.py)
    assert build_loss("ce") is compute_loss


def test_build_loss_named_variants(rng):
    import jax

    from pytorch_segmentation_tpu.ops.loss import (build_loss,
                                                   lovasz_softmax_loss,
                                                   softmax_cross_entropy)

    logits = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 3, (2, 16, 16)), jnp.int32)

    for name in ("lovasz", "ce+lovasz", "focal", "ce+rect", "dice",
                 "ce+dice"):
        fn = build_loss(name)
        v = float(fn(logits, targets))
        assert np.isfinite(v) and v > 0, (name, v)
        g = jax.grad(lambda l: fn(l, targets))(logits)
        assert float(jnp.abs(g).max()) > 0, name

    # composition math: ce+lovasz == ce + lovasz on full-res logits
    want = float(softmax_cross_entropy(logits, targets)
                 + lovasz_softmax_loss(logits, targets))
    np.testing.assert_allclose(float(build_loss("ce+lovasz")(logits,
                                                             targets)),
                               want, rtol=1e-6)

    # low-res logits upsample before the criterion (deferred-upsample
    # models): equals the loss on manually upsampled logits
    from pytorch_segmentation_tpu.ops.resize import resize_bilinear
    low = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    up = resize_bilinear(low, (16, 16), align_corners=True)
    np.testing.assert_allclose(float(build_loss("lovasz")(low, targets)),
                               float(lovasz_softmax_loss(up, targets)),
                               rtol=1e-6)

    with pytest.raises(ValueError):
        build_loss("nope")


def test_train_step_with_named_loss(rng):
    """One optimization step with a non-default loss through the real
    train-step machinery (custom losses bypass the fused-CE substitution)."""
    import flax.linen as fnn
    import optax

    from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                       make_train_step)
    from pytorch_segmentation_tpu.ops.loss import build_loss

    class Tiny(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            return fnn.Conv(3, (1, 1), param_dtype=jnp.float32)(x)

    state = create_train_state(Tiny(), jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, 8, 3)), optax.sgd(1e-2))
    step = make_train_step(loss_fn=build_loss("ce+lovasz"), donate=False)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 3, (2, 8, 8)), jnp.int32)
    s1, l1 = step(state, x, y)
    _s2, l2 = step(s1, x, y)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1)  # one SGD step on the same batch improves


def test_dice_loss_properties(rng):
    """Dice: ~0 on a confident correct prediction, near-max on a confident
    wrong one; absent classes don't contribute (masked like lovasz); torch
    cross-check of the soft-dice formula."""
    import torch

    from pytorch_segmentation_tpu.ops.loss import dice_loss

    targets = jnp.asarray(rng.integers(0, 3, (2, 16, 16)), jnp.int32)
    perfect = 50.0 * jax.nn.one_hot(targets, 3, dtype=jnp.float32)
    assert float(dice_loss(perfect, targets)) < 1e-3
    wrong = 50.0 * jax.nn.one_hot((targets + 1) % 3, 3, dtype=jnp.float32)
    assert float(dice_loss(wrong, targets)) > 0.9

    # absent-class masking: class 2 never appears -> mean over 2 classes
    targets01 = jnp.asarray(rng.integers(0, 2, (1, 8, 8)), jnp.int32)
    logits = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    ours = float(dice_loss(logits, targets01, smooth=1.0))

    # torch reference of the same formula
    tl = torch.from_numpy(np.asarray(logits)).permute(0, 3, 1, 2)
    p = torch.softmax(tl, 1).permute(0, 2, 3, 1).reshape(-1, 3)
    oh = torch.nn.functional.one_hot(
        torch.from_numpy(np.asarray(targets01)).long().reshape(-1), 3).float()
    inter = (p * oh).sum(0)
    card = p.sum(0) + oh.sum(0)
    dice = (2 * inter + 1.0) / (card + 1.0)
    present = oh.sum(0) > 0
    want = float(1.0 - dice[present].mean())
    np.testing.assert_allclose(ours, want, rtol=1e-5)
