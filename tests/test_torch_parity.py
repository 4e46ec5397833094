"""Numerical parity of core blocks vs torch equivalents with copied weights
(SURVEY.md §4: 'golden forward activations vs the PyTorch reference').

Validates the exact semantics the models depend on: torch-style explicit
conv padding (incl. stride-2 and dilated convs), BN train/eval math, maxpool
geometry, and a full Bottleneck residual block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
from flax import linen as nn

from pytorch_segmentation_tpu.nn.blocks import BatchNorm2d, ConvNormAct


def _to_torch(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _from_torch(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _copy_conv_weights(params, tconv):
    # JAX HWIO -> torch OIHW
    k = np.asarray(params["kernel"])
    tconv.weight.data = torch.from_numpy(
        np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1))))


@pytest.mark.parametrize("stride,dilation,ksize", [
    (1, 1, 3), (2, 1, 3), (1, 6, 3), (2, 1, 7), (1, 1, 1)])
def test_conv_norm_act_matches_torch(stride, dilation, ksize, rng):
    x = rng.standard_normal((2, 17, 19, 5)).astype(np.float32)
    m = ConvNormAct(8, kernel_size=ksize, stride=stride, dilation=dilation,
                    dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    y = np.asarray(m.apply(variables, jnp.asarray(x), train=False))

    pad = dilation * (ksize - 1) // 2
    tconv = tnn.Conv2d(5, 8, ksize, stride=stride, padding=pad,
                       dilation=dilation, bias=False)
    _copy_conv_weights(variables["params"]["conv"], tconv)
    tbn = tnn.BatchNorm2d(8, momentum=0.1, eps=1e-5)
    tbn.eval()
    with torch.no_grad():
        ref = F.relu(tbn(tconv(_to_torch(x))))
    np.testing.assert_allclose(y, _from_torch(ref), rtol=1e-4, atol=1e-4)


def test_bn_train_step_matches_torch(rng):
    """One train-mode BN pass: output + running-stat update vs torch
    (biased batch var in output; torch tracks unbiased running var — we
    track biased, so compare output and mean only)."""
    x = rng.standard_normal((4, 8, 8, 6)).astype(np.float32) * 2 + 3
    m = BatchNorm2d(dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       use_running_average=False)
    y, mut = m.apply(variables, jnp.asarray(x), use_running_average=False,
                     mutable=["batch_stats"])
    tbn = tnn.BatchNorm2d(6, momentum=0.1, eps=1e-5)
    tbn.train()
    ref = tbn(_to_torch(x))
    np.testing.assert_allclose(np.asarray(y), _from_torch(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        tbn.running_mean.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_maxpool_geometry_matches_torch(rng):
    """ResNet stem maxpool: 3x3 stride 2 pad 1 (-inf padding)."""
    x = rng.standard_normal((1, 13, 13, 4)).astype(np.float32)
    ours = np.asarray(nn.max_pool(jnp.asarray(x), (3, 3), strides=(2, 2),
                                  padding=[(1, 1), (1, 1)]))
    ref = F.max_pool2d(_to_torch(x), 3, stride=2, padding=1)
    np.testing.assert_allclose(ours, _from_torch(ref), rtol=1e-6)


def test_bottleneck_block_matches_torch(rng):
    from pytorch_segmentation_tpu.nn.backbones.resnet import Bottleneck
    x = rng.standard_normal((1, 12, 12, 16)).astype(np.float32)
    m = Bottleneck(8, stride=2, downsample=True, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    y = np.asarray(m.apply(variables, jnp.asarray(x), train=False))

    p = variables["params"]
    c1 = tnn.Conv2d(16, 8, 1, bias=False)
    c2 = tnn.Conv2d(8, 8, 3, stride=2, padding=1, bias=False)
    c3 = tnn.Conv2d(8, 32, 1, bias=False)
    cd = tnn.Conv2d(16, 32, 1, stride=2, bias=False)
    for conv, key in ((c1, "conv1"), (c2, "conv2"), (c3, "conv3"),
                      (cd, "downsample")):
        _copy_conv_weights(p[key]["conv"], conv)
    with torch.no_grad():
        t = _to_torch(x)
        out = F.relu(c1(t))
        out = F.relu(c2(out))
        out = c3(out)
        out = F.relu(out + cd(t))  # fresh-init BNs are identity in eval
    np.testing.assert_allclose(y, _from_torch(out), rtol=1e-3, atol=1e-3)
