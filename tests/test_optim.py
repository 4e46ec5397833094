"""Optimizer-transform wiring: --weight-decay / --clip-grad / --momentum
(train.py flags -> Trainer tx chain). The reference's optimizer lives in the
unavailable pytorch_modules Trainer; these flags realize the standard torch
training knobs (SGD momentum, decoupled L2, clip_grad_norm_) on optax.

Uses a tiny Dense module + stub fetcher so the Trainer constructs without
any model compile; assertions run the optax chain directly.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_segmentation_tpu.engine import Trainer


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return nn.Dense(2)(x.mean(axis=(1, 2)))


class _StubDataset:
    img_size = (8, 8)


class _StubLoader:
    dataset = _StubDataset()


class _StubFetcher:
    loader = _StubLoader()


def _make_trainer(**kw):
    return Trainer(_Tiny(), _StubFetcher(), log=False, **kw)


def _first_update(tx, params, grads):
    updates, _ = tx.update(grads, tx.init(params), params)
    return updates


def test_clip_grad_global_norm():
    tr = _make_trainer(lr=0.1, clip_grad=1.0)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.full((3,), 100.0)}  # global norm ~173
    upd = _first_update(tr.tx, params, grads)
    # first SGD-momentum step: update = -lr * clipped grad (norm == 1.0)
    norm = jnp.sqrt(sum(jnp.sum(u * u) for u in jax.tree.leaves(upd)))
    assert abs(float(norm) - 0.1) < 1e-5, float(norm)


def test_clip_grad_noop_below_threshold():
    tr = _make_trainer(lr=0.1, clip_grad=1e9)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.array([3.0, 0.0, -4.0])}
    upd = _first_update(tr.tx, params, grads)
    assert jnp.allclose(upd["w"], -0.1 * grads["w"], atol=1e-6)


def test_weight_decay_coupled_torch_semantics():
    """weight_decay adds wd*p to the GRADIENT before the optimizer (torch
    SGD weight_decay — coupled L2): the momentum trace must see the decay
    term, unlike decoupled SGDW/AdamW."""
    tr = _make_trainer(lr=0.1, weight_decay=0.01)
    params = {"w": jnp.array([2.0, -2.0])}
    grads = {"w": jnp.zeros((2,))}
    st = tr.tx.init(params)
    upd, st = tr.tx.update(grads, st, params)
    # first step: update = -lr * wd * p (same for coupled and decoupled)
    assert jnp.allclose(upd["w"], -0.1 * 0.01 * params["w"], atol=1e-7)
    # second step distinguishes them: COUPLED momentum accumulates the
    # decay (trace = wd*p*(1+m) -> update 1.9x); decoupled would repeat -lr*wd*p
    upd2, st = tr.tx.update(grads, st, params)
    assert jnp.allclose(upd2["w"], 1.9 * upd["w"], atol=1e-7)


def test_momentum_flag():
    tr = _make_trainer(lr=0.1, momentum=0.0)
    params = {"w": jnp.array([1.0])}
    grads = {"w": jnp.array([1.0])}
    st = tr.tx.init(params)
    upd1, st = tr.tx.update(grads, st, params)
    upd2, st = tr.tx.update(grads, st, params)
    # no momentum: identical consecutive updates
    assert jnp.allclose(upd1["w"], upd2["w"])
    tr9 = _make_trainer(lr=0.1, momentum=0.9)
    st = tr9.tx.init(params)
    upd1, st = tr9.tx.update(grads, st, params)
    upd2, st = tr9.tx.update(grads, st, params)
    # momentum: second update accumulates the trace (1.9x the first)
    assert abs(float(upd2["w"][0] / upd1["w"][0]) - 1.9) < 1e-5
