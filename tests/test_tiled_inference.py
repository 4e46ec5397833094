"""Sliding-window (tiled) native-resolution inference
(inference.make_tiled_mask_fn, CLI --tile).

Exactness anchors:
  * a 1x1-conv model has no spatial mixing, so tiling is EXACTLY equivalent
    to the full-image forward — masks must match make_mask_fn bit-for-bit;
  * when one tile covers the whole image, the tiled path must equal the
    plain path for ANY model;
  * offsets cover the full extent (first at 0, last flush with the end).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pytorch_segmentation_tpu.engine.trainer import ModelBundle
from pytorch_segmentation_tpu.inference import (_tile_offsets, make_mask_fn,
                                                make_tiled_mask_fn)


class PointwiseNet(nn.Module):
    """1x1 convs only — tiling must be exact."""
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


def _bundle(model, hw=(16, 16), rng=0):
    variables = model.init({"params": jax.random.PRNGKey(rng)},
                           jnp.zeros((1, *hw, 3)), train=False)
    return ModelBundle(model, variables["params"], {})


def test_tile_offsets_cover():
    offs = _tile_offsets(100, 40, overlap=0.25)
    assert offs[0] == 0 and offs[-1] == 60
    # every pixel covered: gaps between consecutive offsets <= tile
    assert all(b - a <= 40 for a, b in zip(offs, offs[1:]))
    # single tile when the image fits
    assert _tile_offsets(30, 40, 0.25) == (0,)
    assert _tile_offsets(40, 40, 0.25) == (0,)


def test_pointwise_tiling_exact():
    bundle = _bundle(PointwiseNet())
    x = np.random.RandomState(0).randint(0, 255, (2, 37, 45, 3), np.uint8)
    full = np.asarray(make_mask_fn(bundle, out_hw=(37, 45))(x))
    tiled = np.asarray(make_tiled_mask_fn(bundle, tile_hw=(16, 16),
                                          overlap=0.5)(x))
    np.testing.assert_array_equal(full, tiled)


def test_single_tile_equals_plain():
    bundle = _bundle(Spatial())
    x = np.random.RandomState(1).randint(0, 255, (1, 16, 16, 3), np.uint8)
    full = np.asarray(make_mask_fn(bundle, out_hw=(16, 16))(x))
    tiled = np.asarray(make_tiled_mask_fn(bundle, tile_hw=(16, 16))(x))
    np.testing.assert_array_equal(full, tiled)


def test_smaller_than_tile_pads_and_crops():
    bundle = _bundle(Spatial())
    x = np.random.RandomState(2).randint(0, 255, (1, 11, 13, 3), np.uint8)
    out = np.asarray(make_tiled_mask_fn(bundle, tile_hw=(16, 16))(x))
    assert out.shape == (1, 11, 13)
    assert out.min() >= 0 and out.max() < 3


def test_tta_composes_with_tiling():
    bundle = _bundle(PointwiseNet(), rng=3)
    x = np.random.RandomState(3).randint(0, 255, (1, 20, 24, 3), np.uint8)
    # pointwise net: tiled+TTA must equal full-image TTA path exactly
    full_tta = np.asarray(make_mask_fn(bundle, out_hw=(20, 24),
                                       tta_flip=True)(x))
    tiled_tta = np.asarray(make_tiled_mask_fn(bundle, tile_hw=(16, 16),
                                              overlap=0.25,
                                              tta_flip=True)(x))
    np.testing.assert_array_equal(full_tta, tiled_tta)


def test_lowres_logits_model_upsampled_per_tile():
    """A model that emits stride-2 logits gets its tile logits bilinearly
    upsampled back to tile resolution before pasting."""
    class Stride2(nn.Module):
        num_classes: int = 3

        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(self.num_classes, (2, 2), strides=(2, 2))(x)

    bundle = _bundle(Stride2())
    x = np.random.RandomState(4).randint(0, 255, (1, 24, 24, 3), np.uint8)
    out = np.asarray(make_tiled_mask_fn(bundle, tile_hw=(16, 16))(x))
    assert out.shape == (1, 24, 24)
