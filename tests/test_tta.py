"""Flip test-time augmentation (test.py --tta / make_mask_fn(tta_flip=True)).

Contract: logits are averaged with a horizontally-flipped second forward
(flip W in, flip W back out), and the averaged logits flow through the same
eval/serving paths. Verified against a manual two-forward average, and for
exactness: a left-right-symmetric model must produce identical confusion
counts with and without TTA.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pytorch_segmentation_tpu.engine.steps import TrainState, make_eval_step
from pytorch_segmentation_tpu.engine.trainer import ModelBundle
from pytorch_segmentation_tpu.inference import make_infer_fn, make_mask_fn


class TinyCNN(nn.Module):
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1))(x)


def _bundle(rng=0, num_classes=3, hw=(16, 16)):
    model = TinyCNN(num_classes=num_classes)
    variables = model.init({"params": jax.random.PRNGKey(rng)},
                           jnp.zeros((1, *hw, 3)), train=False)
    return ModelBundle(model, variables["params"], {})


def test_eval_step_tta_matches_manual_average():
    bundle = _bundle()
    state = TrainState(step=0, params=bundle.params, batch_stats={},
                       opt_state=None, tx=None, apply_fn=bundle.apply_fn)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    segs = jax.random.randint(jax.random.PRNGKey(2), (4, 16, 16), 0, 3)
    valid = jnp.array(4)

    step = make_eval_step(3, tta_flip=False)
    step_tta = make_eval_step(3, tta_flip=True)
    loss_tta, tp_t, fn_t, fp_t = step_tta(state, x, segs, valid)

    # manual: average logits of x and flipped(x), then reuse the plain step
    # by wrapping an apply_fn that returns the averaged logits
    def avg_apply(variables, images, train=False):
        a = bundle.apply_fn(variables, images, train=train)
        b = bundle.apply_fn(variables, jnp.flip(images, axis=2), train=train)
        return (a + jnp.flip(b, axis=2)) * 0.5

    state_avg = state.replace(apply_fn=avg_apply)
    loss_m, tp_m, fn_m, fp_m = step(state_avg, x, segs, valid)
    np.testing.assert_allclose(float(loss_tta), float(loss_m), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tp_t), np.asarray(tp_m))
    np.testing.assert_allclose(np.asarray(fn_t), np.asarray(fn_m))
    np.testing.assert_allclose(np.asarray(fp_t), np.asarray(fp_m))


def test_mask_fn_tta_matches_manual():
    bundle = _bundle(rng=3)
    x = np.random.RandomState(0).randint(0, 255, (2, 16, 16, 3), np.uint8)
    mask = make_mask_fn(bundle, out_hw=(16, 16), tta_flip=True)(x)
    probs = make_infer_fn(bundle, tta_flip=True)(x)
    # argmax of TTA probs == TTA mask path (same averaged logits)
    np.testing.assert_array_equal(np.asarray(mask),
                                  np.asarray(probs).argmax(-1))
    # and both differ (in general) from the non-TTA prediction probs
    p0 = make_infer_fn(bundle, tta_flip=False)(x)
    assert np.abs(np.asarray(p0) - np.asarray(probs)).max() > 1e-7


def test_normalize_and_snap_scales():
    from pytorch_segmentation_tpu.ops.tta import (normalize_tta_scales,
                                                  snap_scale_size)
    # 1.0 dropped (base always runs), dupes dropped, order kept
    assert normalize_tta_scales([0.75, 1.0, 1.25, 0.75]) == (0.75, 1.25)
    assert normalize_tta_scales(None) == ()
    assert normalize_tta_scales(()) == ()
    # /32 snap (UNet's x2-upsample concat needs it), min one tile
    assert snap_scale_size((513, 513), 0.75) == (384, 384)
    assert snap_scale_size((64, 64), 0.5) == (32, 32)
    assert snap_scale_size((64, 64), 1.5) == (96, 96)
    assert snap_scale_size((64, 64), 0.1) == (32, 32)


def test_tta_scales_unit_scale_is_exact_noop():
    bundle = _bundle(rng=5)
    x = np.random.RandomState(2).randint(0, 255, (2, 32, 32, 3), np.uint8)
    p0 = np.asarray(make_infer_fn(bundle)(x))
    p1 = np.asarray(make_infer_fn(bundle, tta_scales=(1.0,))(x))
    np.testing.assert_array_equal(p0, p1)


def test_tta_scales_matches_manual_composition():
    """tta_logits with scales must equal the hand-built ensemble: resize
    the normalized input to each /32-snapped size, forward, resize logits
    back, average with the base forward (f32 accumulation)."""
    from pytorch_segmentation_tpu.ops.resize import resize_bilinear
    from pytorch_segmentation_tpu.ops.tta import tta_logits

    bundle = _bundle(rng=6, hw=(64, 64))
    variables = {"params": bundle.params, "batch_stats": {}}

    def fwd(xx):
        return bundle.apply_fn(variables, xx, train=False)

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 64, 3))
    got = tta_logits(fwd, x, scales=(0.5, 1.5), flip=False)

    base = fwd(x)
    acc = base.astype(jnp.float32)
    for hw in ((32, 32), (96, 96)):
        xi = resize_bilinear(x, hw, align_corners=True)
        li = fwd(xi)
        acc = acc + resize_bilinear(li.astype(jnp.float32), (64, 64),
                                    align_corners=True)
    want = (acc / 3.0).astype(base.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_eval_step_tta_scales_matches_manual_average():
    """Multi-scale TTA through the eval step == the plain eval step run on
    an apply_fn that returns the manually averaged ensemble logits."""
    from pytorch_segmentation_tpu.ops.tta import tta_logits

    bundle = _bundle(rng=8, hw=(64, 64))
    state = TrainState(step=0, params=bundle.params, batch_stats={},
                       opt_state=None, tx=None, apply_fn=bundle.apply_fn)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 64, 64, 3))
    segs = jax.random.randint(jax.random.PRNGKey(10), (4, 64, 64), 0, 3)
    valid = jnp.array(4)

    step_tta = make_eval_step(3, tta_flip=True, tta_scales=(0.5, 1.5))
    loss_t, tp_t, fn_t, fp_t = step_tta(state, x, segs, valid)

    def avg_apply(variables, images, train=False):
        return tta_logits(
            lambda xx: bundle.apply_fn(variables, xx, train=train),
            images, scales=(0.5, 1.5), flip=True)

    step = make_eval_step(3)
    loss_m, tp_m, fn_m, fp_m = step(state.replace(apply_fn=avg_apply),
                                    x, segs, valid)
    np.testing.assert_allclose(float(loss_t), float(loss_m), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(tp_t), np.asarray(tp_m))
    np.testing.assert_array_equal(np.asarray(fn_t), np.asarray(fn_m))
    np.testing.assert_array_equal(np.asarray(fp_t), np.asarray(fp_m))


def test_mask_fn_tta_scales_consistent_with_infer_fn():
    bundle = _bundle(rng=11, hw=(64, 64))
    x = np.random.RandomState(3).randint(0, 255, (2, 64, 64, 3), np.uint8)
    mask = make_mask_fn(bundle, out_hw=(64, 64), tta_flip=True,
                        tta_scales=(0.5, 1.5))(x)
    probs = make_infer_fn(bundle, tta_flip=True, tta_scales=(0.5, 1.5))(x)
    np.testing.assert_array_equal(np.asarray(mask),
                                  np.asarray(probs).argmax(-1))
    # and the ensemble genuinely differs from flip-only TTA
    p_flip = make_infer_fn(bundle, tta_flip=True)(x)
    assert np.abs(np.asarray(p_flip) - np.asarray(probs)).max() > 1e-7


def test_tta_output_symmetric_for_symmetric_input():
    """On a horizontally symmetric input, the TTA-averaged prediction is
    itself flip-invariant: (f(x) + flip(f(flip(x))))/2 with flip(x)=x is
    the flip-symmetrization of f(x)."""
    bundle = _bundle(rng=4)
    half = np.random.RandomState(1).randint(0, 255, (1, 16, 8, 3), np.uint8)
    sym = np.concatenate([half, half[:, :, ::-1]], axis=2)
    p_tta = np.asarray(make_infer_fn(bundle, tta_flip=True)(sym))
    np.testing.assert_allclose(p_tta, p_tta[:, :, ::-1], atol=1e-5)
    # whereas the raw forward is NOT flip-invariant (asymmetric kernels)
    p_raw = np.asarray(make_infer_fn(bundle, tta_flip=False)(sym))
    assert np.abs(p_raw - p_raw[:, :, ::-1]).max() > 1e-6
