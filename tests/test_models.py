"""Per-architecture shape/dtype tests (SURVEY.md §4): output at input
resolution for all models, correct tap channels, bf16 policy."""

import jax
import jax.numpy as jnp
import pytest

from pytorch_segmentation_tpu.models import (MODEL_REGISTRY, DeepLabV3Plus,
                                             HRNet, UNet, build_model)
from pytorch_segmentation_tpu.nn.backbones.mobilenetv2 import (
    MOBILENETV2_TAP_CHANNELS, MobileNetV2)
from pytorch_segmentation_tpu.nn.backbones.resnet import ResNet


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_model_output_shape(name):
    model = build_model(name, num_classes=3, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 64, 64, 3)
    assert y.dtype == jnp.float32


def test_mobilenetv2_tap_channels_and_strides():
    m = MobileNetV2(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    taps = m.apply(variables, x, train=False)
    # channels 16/24/32/96/1280 at strides 2/4/8/16/32 (SURVEY.md §2.9)
    for tap, ch, stride in zip(taps, MOBILENETV2_TAP_CHANNELS,
                               (2, 4, 8, 16, 32)):
        assert tap.shape[-1] == ch
        assert tap.shape[1] == 64 // stride


def test_resnet50_dilated_feature_list():
    m = ResNet(block="bottleneck", layers=(3, 4, 6, 3),
               replace_stride_with_dilation=(False, False, True),
               dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    feats = m.apply(variables, x, train=False)
    # features[1] = 256ch stride-4; features[-1] = 2048ch stride-16 (dilated)
    assert feats[1].shape == (1, 16, 16, 256)
    assert feats[-1].shape == (1, 4, 4, 2048)


def test_bf16_policy():
    model = UNet(num_classes=2, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # params stay f32 (master weights), activations bf16
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(variables["params"]))
    y = model.apply(variables, x, train=False)
    assert y.dtype == jnp.bfloat16


def test_train_mode_updates_batch_stats():
    model = HRNet(num_classes=2, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not jnp.allclose(a, b) for a, b in zip(before, after))


def test_pspnet_deferred_and_adaptive_pool():
    """PSPNet: stride-8 logits under full_res_output=False, and the
    adaptive pool matches torch.AdaptiveAvgPool2d exactly (window
    boundary semantics) on a non-divisible size."""
    import numpy as np
    import torch

    from pytorch_segmentation_tpu.models import PSPNet
    from pytorch_segmentation_tpu.ops.pool import adaptive_avg_pool2d

    model = PSPNet(num_classes=3, dtype=jnp.float32, full_res_output=False)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 8, 8, 3)  # output_stride 8
    assert model.output_stride == 8

    r = np.random.RandomState(0)
    a = r.standard_normal((2, 13, 11, 5)).astype(np.float32)  # non-divisible
    for bins in (1, 2, 3, 6):
        ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(a), (bins, bins)))
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(np.transpose(a, (0, 3, 1, 2))), bins)
        ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_fpn_deferred_and_resnet34_variant():
    """FPN: stride-4 logits under full_res_output=False; the block='basic'
    (ResNet-34 laterals 64/128/256/512) variant builds and runs."""
    from pytorch_segmentation_tpu.models import FPN

    model = FPN(num_classes=3, dtype=jnp.float32, full_res_output=False)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 16, 16, 3)  # output_stride 4
    assert model.output_stride == 4
    assert model.up_align_corners is False

    m34 = FPN(num_classes=3, block="basic", backbone_layers=(2, 2, 2, 2),
              dtype=jnp.float32)
    v34 = m34.init(jax.random.PRNGKey(0), x, train=False)
    assert m34.apply(v34, x, train=False).shape == (1, 64, 64, 3)
