"""Fused BN-apply+ReLU+matmul+BN-stats kernel vs the plain-XLA reference
(interpret mode on CPU). TPU-compile proof lives in tools/bench_fused_matmul
(interpret-pass != Mosaic-compiles, per CLAUDE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_segmentation_tpu.ops.pallas.fused_matmul_bn import (
    bn_act_matmul_reference, fused_bn_act_matmul)


def _data(rng, n, k, m, dtype=jnp.float32):
    x = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32), dtype)
    scale = jnp.asarray(0.5 + rng.random(k).astype(np.float32))
    shift = jnp.asarray(0.2 * rng.standard_normal(k).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, m)).astype(np.float32) * 0.1,
                    dtype)
    return x, scale, shift, w


@pytest.mark.parametrize("n,k,m,tn", [
    (512, 128, 256, 256),   # aligned
    (300, 128, 128, 128),   # ragged N (masked rows)
    (257, 64, 64, 128),     # sub-128 channel dims + ragged N
    (128, 256, 1024, 64),   # multiple M tiles... m>512 path
])
def test_forward_matches_reference(n, k, m, tn, rng):
    x, scale, shift, w = _data(rng, n, k, m)
    y_ref, s_ref, ss_ref = bn_act_matmul_reference(x, scale, shift, w)
    y, s, ss = fused_bn_act_matmul(x, scale, shift, w, tn=tn, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ss_ref),
                               rtol=1e-4, atol=1e-3)


def test_gradients_match_reference(rng):
    """All four cotangents (dx, dscale, dshift, dW) through a loss that uses
    y AND the statistics (the sums feed the next layer's normalize, so their
    cotangents are non-zero in real use)."""
    n, k, m = 192, 128, 256
    x, scale, shift, w = _data(rng, n, k, m)
    gy = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32))
    gs = jnp.asarray(rng.standard_normal(m).astype(np.float32) * 0.01)
    gss = jnp.asarray(rng.standard_normal(m).astype(np.float32) * 0.001)

    def loss(fn):
        def f(x, scale, shift, w):
            y, s, ss = fn(x, scale, shift, w)
            return (jnp.sum(y * gy) + jnp.sum(s * gs) + jnp.sum(ss * gss))
        return f

    ref_grads = jax.grad(loss(bn_act_matmul_reference),
                         argnums=(0, 1, 2, 3))(x, scale, shift, w)
    fused_grads = jax.grad(
        loss(lambda *a: fused_bn_act_matmul(*a, tn=64, interpret=True)),
        argnums=(0, 1, 2, 3))(x, scale, shift, w)
    for g, r, name in zip(fused_grads, ref_grads,
                          ("dx", "dscale", "dshift", "dw")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


def test_fused_bottleneck_matches_plain_path(rng):
    """The block-fused Bottleneck (Pallas 1x1s, interpret mode) is
    numerically the plain ConvNormAct chain with the same variables —
    outputs, running-stat updates, and parameter gradients."""
    from pytorch_segmentation_tpu.nn import blocks
    from pytorch_segmentation_tpu.nn.backbones.resnet import Bottleneck

    x = jax.nn.relu(jnp.asarray(
        rng.standard_normal((2, 8, 8, 32)).astype(np.float32)))
    m = Bottleneck(16, stride=1, downsample=True, dtype=jnp.float32)

    def run(mode, train):
        blocks.set_force_fused_1x1(mode)
        try:
            variables = m.init(jax.random.PRNGKey(0), x, train=False)
            if not train:
                return m.apply(variables, x, train=False), None, None

            def loss_fn(params):
                y, mut = m.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])
                return jnp.sum(y ** 2), mut["batch_stats"]

            (val, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                variables["params"])
            return val, mut, grads
        finally:
            blocks.set_force_fused_1x1(None)

    y_plain, _, _ = run("off", train=False)
    y_fused, _, _ = run("interpret", train=False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               rtol=1e-4, atol=1e-4)

    v_plain, mut_plain, g_plain = run("off", train=True)
    v_fused, mut_fused, g_fused = run("interpret", train=True)
    assert abs(float(v_plain) - float(v_fused)) < 1e-2 * abs(float(v_plain))
    def assert_tree_close(a_tree, b_tree, atol):
        for (pa, a), (pb, b) in zip(jax.tree.leaves_with_path(a_tree),
                                    jax.tree.leaves_with_path(b_tree)):
            assert str(pa) == str(pb)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=atol,
                                       err_msg=str(pa))

    assert_tree_close(mut_plain, mut_fused, 1e-4)
    assert_tree_close(g_plain, g_fused, 1e-3)


def test_fused_inverted_residual_matches_plain_path(rng):
    """MobileNetV2 InvertedResidual fused path (identity/relu6 prologues)
    == the plain ConvNormAct chain with the same variables."""
    from pytorch_segmentation_tpu.nn import blocks
    from pytorch_segmentation_tpu.nn.backbones.mobilenetv2 import (
        InvertedResidual)

    # block inputs carry no activation: plain (possibly negative) values
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 24)).astype(np.float32))
    m = InvertedResidual(24, stride=1, expand_ratio=6, dtype=jnp.float32)

    def run(mode, train):
        blocks.set_force_fused_1x1(mode)
        try:
            variables = m.init(jax.random.PRNGKey(0), x, train=False)
            if not train:
                return m.apply(variables, x, train=False)
            y, mut = m.apply(variables, x, train=True,
                             mutable=["batch_stats"])
            return y, mut
        finally:
            blocks.set_force_fused_1x1(None)

    y_plain = run("off", train=False)
    y_fused = run("interpret", train=False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               rtol=1e-4, atol=1e-4)
    y_p, mut_p = run("off", train=True)
    y_f, mut_f = run("interpret", train=True)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p),
                               rtol=1e-4, atol=1e-4)
    for (pa, a), (pb, b) in zip(jax.tree.leaves_with_path(mut_p),
                                jax.tree.leaves_with_path(mut_f)):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4, err_msg=str(pa))


def test_batched_shape_roundtrip(rng):
    """[B,H,W,K] input flattens internally and restores the leading shape."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)).astype(np.float32))
    scale = jnp.ones(64)
    shift = jnp.zeros(64)
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    y, s, ss = fused_bn_act_matmul(x, scale, shift, w, tn=64, interpret=True)
    assert y.shape == (2, 8, 8, 128)
    y_ref, s_ref, _ = bn_act_matmul_reference(x.reshape(-1, 64), scale,
                                              shift, w)
    np.testing.assert_allclose(np.asarray(y).reshape(-1, 128),
                               np.asarray(y_ref), rtol=1e-4, atol=1e-4)
