"""Inference core: preprocessing contracts, batching invariance,
multi-scale post-fetch behaviour."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_segmentation_tpu.data import CocoDataset, DataLoader
from pytorch_segmentation_tpu.data.loader import Batch
from pytorch_segmentation_tpu.data.pipeline import PostFetch
from pytorch_segmentation_tpu.engine import ModelBundle
from pytorch_segmentation_tpu.inference import inference, make_infer_fn
from pytorch_segmentation_tpu.models import UNet


def _bundle(num_classes=3):
    model = UNet(num_classes=num_classes, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    return ModelBundle(model, variables["params"], variables["batch_stats"])


def test_inference_output_shapes(rng):
    bundle = _bundle()
    imgs = [rng.integers(0, 255, (50, 70, 3)).astype(np.uint8),
            rng.integers(0, 255, (33, 44, 3)).astype(np.uint8)]
    preds = inference(bundle, imgs, img_size=(32, 32))
    assert preds[0].shape == (50, 70)
    assert preds[1].shape == (33, 44)
    assert all(set(np.unique(p)).issubset({0, 1, 2}) for p in preds)


def test_legacy_vs_training_preproc_differ(rng):
    bundle = _bundle()
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    fn_train = make_infer_fn(bundle, legacy_preproc=False)
    fn_legacy = make_infer_fn(bundle, legacy_preproc=True)
    p1 = np.asarray(fn_train(img[None]))
    p2 = np.asarray(fn_legacy(img[None]))
    # probabilities sum to 1 either way, inputs normalized differently
    np.testing.assert_allclose(p1.sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(p2.sum(-1), 1.0, rtol=1e-5)
    assert not np.allclose(p1, p2)


def test_infer_batch_invariance(rng):
    bundle = _bundle()
    imgs = rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    fn = make_infer_fn(bundle)
    full = np.asarray(fn(imgs))
    single = np.asarray(fn(imgs[:1]))
    np.testing.assert_allclose(full[0], single[0], rtol=1e-4, atol=1e-5)


def test_multi_scale_post_fetch(rng):
    from pytorch_segmentation_tpu.data.resize_host import multi_scale_sizes
    pf = PostFetch(multi_scale=True, base_hw=(64, 64), seed=3)
    batch = Batch(rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8),
                  rng.integers(0, 3, (2, 64, 64)).astype(np.uint8), 2)
    allowed = set(multi_scale_sizes((64, 64)))
    seen = set()
    for _ in range(6):
        images, segs, valid = pf(batch)
        assert (images.shape[1], images.shape[2]) in allowed
        seen.add((images.shape[1], images.shape[2]))
        # labels stay at base resolution (reference post_fetch semantics)
        assert segs.shape == (2, 64, 64)
    assert len(seen) > 1  # actually varies


def test_make_mask_fn_matches_prob_argmax(rng):
    # full-res logits: mask == argmax of the prob path, exactly
    bundle = _bundle()
    imgs = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    from pytorch_segmentation_tpu.inference import make_mask_fn
    masks = np.asarray(make_mask_fn(bundle)(imgs))
    probs = np.asarray(make_infer_fn(bundle)(imgs))
    assert masks.shape == (2, 32, 32) and masks.dtype == np.int32
    np.testing.assert_array_equal(masks, probs.argmax(-1))


def test_make_mask_fn_low_res_upsample(rng):
    # deferred-upsample model: mask fn upsamples logits (align per model)
    # before argmax — must equal the explicit resize+argmax reference
    from pytorch_segmentation_tpu.inference import make_mask_fn
    from pytorch_segmentation_tpu.models import UNet
    from pytorch_segmentation_tpu.ops.resize import resize_bilinear
    model = UNet(num_classes=3, dtype=jnp.float32, full_res_output=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    bundle = ModelBundle(model, variables["params"],
                         variables["batch_stats"])
    imgs = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    masks = np.asarray(make_mask_fn(bundle, out_hw=(32, 32))(imgs))
    x = (imgs.astype(np.float32)
         - np.array([123.675, 116.28, 103.53])) / np.array(
             [58.395, 57.12, 57.375])
    logits = bundle.apply_fn(variables, jnp.asarray(x), train=False)
    assert logits.shape[1] < 32  # actually exercises the upsample branch
    up = resize_bilinear(
        logits.astype(jnp.float32), (32, 32),
        align_corners=getattr(model, "up_align_corners", True))
    np.testing.assert_array_equal(masks, np.asarray(jnp.argmax(up, -1)))
