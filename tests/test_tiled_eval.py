"""Sliding-window ("slide" mode) EVALUATION (engine/steps.make_eval_step
tile=, test.py --tile) — the mmseg protocol for evaluating at resolutions
above the training crop.

Exactness anchors mirror tests/test_tiled_inference.py:
  * a 1x1-conv model has no spatial mixing, so averaging overlapping tile
    logits reproduces the whole-image logits exactly -> (loss, tp, fn, fp)
    must match the plain eval step bit-for-bit (up to f32 averaging);
  * one tile covering the whole image must equal the plain path for ANY
    model;
  * a low-res-logits model gets its tile logits upsampled to tile
    resolution before canvas-averaging;
  * ignore_index and sample-validity masking compose.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pytorch_segmentation_tpu.engine.steps import TrainState, make_eval_step


class PointwiseNet(nn.Module):
    num_classes: int = 4

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (1, 1))(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1))(x)


class Spatial(nn.Module):
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1))(x)


class Stride2(nn.Module):
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Conv(self.num_classes, (2, 2), strides=(2, 2))(x)


def _state(model, hw=(16, 16), rng=0):
    variables = model.init({"params": jax.random.PRNGKey(rng)},
                           jnp.zeros((1, *hw, 3)), train=False)
    return TrainState(step=0, params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=None, tx=None, apply_fn=model.apply)


def _batch(nc, b=2, hw=(24, 24), seed=0):
    rs = np.random.RandomState(seed)
    images = jnp.asarray(rs.randn(b, *hw, 3).astype(np.float32))
    segs = jnp.asarray(rs.randint(0, nc, (b, *hw)).astype(np.int32))
    return images, segs


def _run(step, state, images, segs, valid):
    return [np.asarray(r) for r in step(state, images, segs, valid)]


def test_pointwise_tiled_eval_matches_plain():
    model = PointwiseNet()
    state = _state(model)
    images, segs = _batch(model.num_classes)
    plain = make_eval_step(model.num_classes)
    tiled = make_eval_step(model.num_classes, tile=(16, 16),
                           tile_overlap=0.5)
    a = _run(plain, state, images, segs, 2)
    b = _run(tiled, state, images, segs, 2)
    np.testing.assert_allclose(a[0], b[0], rtol=2e-5)  # loss
    for x, y in zip(a[1:], b[1:]):  # tp/fn/fp exact
        np.testing.assert_array_equal(x, y)


def test_single_tile_equals_plain_any_model():
    model = Spatial()
    state = _state(model, hw=(24, 24), rng=1)
    images, segs = _batch(model.num_classes, seed=1)
    plain = make_eval_step(model.num_classes)
    tiled = make_eval_step(model.num_classes, tile=(24, 24))
    a = _run(plain, state, images, segs, 2)
    b = _run(tiled, state, images, segs, 2)
    np.testing.assert_allclose(a[0], b[0], rtol=2e-5)
    for x, y in zip(a[1:], b[1:]):
        np.testing.assert_array_equal(x, y)


def test_lowres_model_tiles_upsample_then_average():
    model = Stride2()
    state = _state(model, rng=2)
    images, segs = _batch(model.num_classes, hw=(24, 24), seed=2)
    tiled = make_eval_step(model.num_classes, tile=(16, 16))
    loss, tp, fn, fp = _run(tiled, state, images, segs, 2)
    assert np.isfinite(loss)
    # every label pixel lands somewhere in the confusion sums
    assert (tp.sum() + fn.sum()) == segs.size


def test_valid_mask_excludes_padded_samples():
    model = PointwiseNet()
    state = _state(model, rng=3)
    images, segs = _batch(model.num_classes, b=3, seed=3)
    tiled = make_eval_step(model.num_classes, tile=(16, 16))
    # valid=2: third sample is padding; counts must equal the 2-sample run
    full = _run(tiled, state, images[:2], segs[:2], 2)
    padded = _run(tiled, state, images, segs, 2)
    np.testing.assert_allclose(full[0], padded[0], rtol=1e-6)
    for x, y in zip(full[1:], padded[1:]):
        np.testing.assert_array_equal(x, y)


def test_ignore_index_composes_with_tile():
    model = PointwiseNet()
    state = _state(model, rng=4)
    images, segs = _batch(model.num_classes, seed=4)
    segs = segs.at[:, :4, :].set(255)
    plain = make_eval_step(model.num_classes, ignore_index=255)
    tiled = make_eval_step(model.num_classes, ignore_index=255,
                           tile=(16, 16), tile_overlap=0.5)
    a = _run(plain, state, images, segs, 2)
    b = _run(tiled, state, images, segs, 2)
    np.testing.assert_allclose(a[0], b[0], rtol=2e-5)
    for x, y in zip(a[1:], b[1:]):
        np.testing.assert_array_equal(x, y)
    # ignored pixels really are excluded
    assert (a[1].sum() + a[2].sum()) == int((np.asarray(segs) != 255).sum())


def test_test_cli_threads_tile_flags():
    """--tile/--tile-overlap parse AND reach engine.test (the
    parsed-but-never-passed bug class, tests/test_cli_wiring.py)."""
    import os.path as osp

    import test as test_cli
    src = open(osp.join(osp.dirname(test_cli.__file__), "test.py")).read()
    assert "--tile" in src and "tile_overlap=opt.tile_overlap" in src
    assert "opt.tile[1], opt.tile[0]" in src  # W H flag -> (H, W) kwarg
