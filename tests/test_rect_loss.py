"""RectLoss: rotated-rect targets cover the class mask, match axis-aligned
boxes for axis-aligned shapes, and the loss is finite + differentiable."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_segmentation_tpu.ops.rect_loss import rect_loss, rect_targets


def test_axis_aligned_box_recovered():
    pred = np.zeros((1, 32, 32), np.int32)
    pred[0, 5:15, 8:20] = 1
    t = np.asarray(rect_targets(jnp.asarray(pred), 2))
    box = t[0, :, :, 1]
    inner = box[5:15, 8:20]
    assert inner.min() == 1.0  # rect covers the mask
    # rect is tight up to the half-pixel dilation
    assert box.sum() <= (15 - 5 + 1) * (20 - 8 + 1) + 4


def test_rotated_shape_covered_and_tight():
    ys, xs = np.mgrid[0:48, 0:48]
    diag = (np.abs((xs - 24) + (ys - 24)) < 4) & (np.abs(xs - ys) < 16)
    pred = np.where(diag, 1, 0)[None].astype(np.int32)
    t = np.asarray(rect_targets(jnp.asarray(pred), 2))[0, :, :, 1]
    assert t[pred[0] == 1].min() == 1.0  # covers all class pixels
    # rotated rect is much tighter than the full image
    assert t.sum() < 0.5 * 48 * 48
    # and tighter than the axis-aligned bbox for this diagonal strip
    ys_m, xs_m = np.where(pred[0] == 1)
    aabb = (ys_m.max() - ys_m.min() + 1) * (xs_m.max() - xs_m.min() + 1)
    assert t.sum() < aabb


def test_absent_class_zero_target():
    pred = np.zeros((1, 16, 16), np.int32)
    t = np.asarray(rect_targets(jnp.asarray(pred), 3))
    assert t[..., 1].sum() == 0 and t[..., 2].sum() == 0
    assert t[..., 0].sum() > 0  # background present


def test_rect_loss_grad_finite(rng):
    logits = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    loss, grad = jax.value_and_grad(rect_loss)(logits)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()
    for red in ("sum", "none"):
        out = rect_loss(logits, reduction=red)
        assert np.isfinite(np.asarray(out)).all()
