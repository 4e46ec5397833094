"""Custom BatchNorm2d vs flax.linen.BatchNorm parity (stats, EMA, output)
and the subsampled-statistics mode."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pytorch_segmentation_tpu.nn.blocks import BatchNorm2d


def _flax_bn():
    return nn.BatchNorm(use_running_average=False, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32)


def test_matches_flax_train_mode(rng):
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 8)).astype(np.float32)) * 3 + 1
    ours = BatchNorm2d(dtype=jnp.float32)
    theirs = _flax_bn()
    v1 = ours.init(jax.random.PRNGKey(0), x, use_running_average=False)
    v2 = theirs.init(jax.random.PRNGKey(0), x)
    y1, m1 = ours.apply(v1, x, use_running_average=False,
                        mutable=["batch_stats"])
    y2, m2 = theirs.apply(v2, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1["batch_stats"]["mean"]),
                               np.asarray(m2["batch_stats"]["mean"]),
                               rtol=1e-5, atol=1e-6)
    # running var: torch updates with the UNBIASED batch variance (flax uses
    # the biased one) — ours follows torch
    xs = np.asarray(x)
    n = xs.shape[0] * xs.shape[1] * xs.shape[2]
    var_unbiased = xs.reshape(-1, xs.shape[-1]).var(axis=0, ddof=1)
    expected = 0.9 * 1.0 + 0.1 * var_unbiased
    np.testing.assert_allclose(np.asarray(m1["batch_stats"]["var"]),
                               expected, rtol=1e-4, atol=1e-5)
    # and differs from flax's biased update by exactly n/(n-1)
    assert n / (n - 1) > 1.0


def test_eval_mode_uses_running_stats(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    bn = BatchNorm2d(dtype=jnp.float32)
    v = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
    v = {"params": v["params"],
         "batch_stats": {"mean": jnp.full((4,), 2.0),
                         "var": jnp.full((4,), 4.0)}}
    y = bn.apply(v, x, use_running_average=True)
    expected = (np.asarray(x) - 2.0) / np.sqrt(4.0 + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-5)


def test_subsampled_stats_close(rng):
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 8)).astype(np.float32))
    exact = BatchNorm2d(dtype=jnp.float32, stat_subsample=1)
    sub = BatchNorm2d(dtype=jnp.float32, stat_subsample=2)
    v = exact.init(jax.random.PRNGKey(0), x, use_running_average=False)
    y1, m1 = exact.apply(v, x, use_running_average=False,
                         mutable=["batch_stats"])
    y2, m2 = sub.apply(v, x, use_running_average=False,
                       mutable=["batch_stats"])
    # statistics from 1/4 of pixels stay within estimator noise
    np.testing.assert_allclose(np.asarray(m1["batch_stats"]["mean"]),
                               np.asarray(m2["batch_stats"]["mean"]),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=0.2)
    # tiny maps never subsample (guard)
    small = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    v_s = sub.init(jax.random.PRNGKey(0), small, use_running_average=False)
    ys, ms = sub.apply(v_s, small, use_running_average=False,
                       mutable=["batch_stats"])
    ve = exact.init(jax.random.PRNGKey(0), small, use_running_average=False)
    ye, me = exact.apply(ve, small, use_running_average=False,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ye), rtol=1e-6)
