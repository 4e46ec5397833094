"""MaskFormer set-prediction tests: matcher optimality (device Sinkhorn
vs exact host Hungarian), loss equivalence under both matchers, and the
end-to-end train-step contract (dict outputs through make_train_step)
with a shown-to-learn run on the synthetic-shapes task.

models/maskformer.py is an addition beyond the reference (the reference
is per-pixel-CE only); forward parity vs the torch mirror lives in
test_model_golden_parity.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from scipy.optimize import linear_sum_assignment

from pytorch_segmentation_tpu.engine.steps import (TrainState,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import MaskFormer
from pytorch_segmentation_tpu.models.maskformer import (_hungarian_assign,
                                                        _sinkhorn_assign,
                                                        make_maskformer_loss)

TINY = dict(backbone_layers=(1, 1, 1, 1), dim=64, mask_dim=64,
            fpn_channels=64, num_queries=8, heads=4, dec_layers=2)


def _rand_costs(rng, b=4, nq=12, nc=5, all_present=False):
    cost = rng.standard_normal((b, nq, nc)).astype(np.float32)
    present = (np.ones((b, nc), bool) if all_present
               else rng.random((b, nc)) < 0.7)
    present[:, 0] = True  # at least one present column per item
    return jnp.asarray(cost), jnp.asarray(present)


def test_sinkhorn_matches_hungarian_cost():
    """The device matcher's assignments must be collision-free and within
    1e-3 of the exact optimum's total cost (ties may swap queries)."""
    rng = np.random.default_rng(0)
    for trial in range(10):
        cost, present = _rand_costs(rng)
        a_s = np.asarray(_sinkhorn_assign(cost, present))
        cost_np, pres_np = np.asarray(cost), np.asarray(present)
        for b in range(cost_np.shape[0]):
            # one distinct query per present class
            counts = a_s[b].sum(-1)
            np.testing.assert_array_equal(counts, pres_np[b].astype(float))
            qidx = a_s[b].argmax(-1)[pres_np[b]]
            assert len(set(qidx.tolist())) == len(qidx), "query collision"
            cols = np.nonzero(pres_np[b])[0]
            r, c = linear_sum_assignment(cost_np[b][:, cols])
            opt = cost_np[b][:, cols][r, c].sum()
            got = (a_s[b] * cost_np[b].T).sum()
            assert got <= opt + 1e-3, (trial, b, got, opt)


def test_hungarian_callback_is_exact():
    rng = np.random.default_rng(1)
    cost, present = _rand_costs(rng)
    a_h = np.asarray(_hungarian_assign(cost, present))
    cost_np, pres_np = np.asarray(cost), np.asarray(present)
    for b in range(cost_np.shape[0]):
        cols = np.nonzero(pres_np[b])[0]
        r, c = linear_sum_assignment(cost_np[b][:, cols])
        opt = cost_np[b][:, cols][r, c].sum()
        got = (a_h[b] * cost_np[b].T).sum()
        np.testing.assert_allclose(got, opt, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_model_outputs():
    rng = np.random.default_rng(2)
    model = MaskFormer(num_classes=3, dtype=jnp.float32, **TINY)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=True, mutable=["batch_stats"])[0]
    segs = jnp.asarray(rng.integers(0, 3, (2, 64, 64)), jnp.int32)
    return out, segs


def test_loss_matcher_equivalence(tiny_model_outputs):
    """At init the cost landscape is benign: both matchers must produce
    the same (finite) loss, and gradients must be finite."""
    out, segs = tiny_model_outputs
    ls = make_maskformer_loss(3, matcher="sinkhorn")(out, segs)
    lh = make_maskformer_loss(3, matcher="hungarian")(out, segs)
    assert np.isfinite(float(ls)) and np.isfinite(float(lh))
    np.testing.assert_allclose(float(ls), float(lh), rtol=1e-4)

    g = jax.grad(lambda o: make_maskformer_loss(3)(o, segs))(out)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_train_step_learns_shapes():
    """Dict train outputs flow through make_train_step with the set loss,
    and ~40 SGD steps on one synthetic-shapes batch push the loss down
    and the semantic argmax toward the labels."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from parity_e2e import make_shapes_data

    rng = np.random.default_rng(3)
    xs, ys = make_shapes_data(4, 64, rng)
    x, y = jnp.asarray(xs), jnp.asarray(ys)

    model = MaskFormer(num_classes=3, dtype=jnp.float32, **TINY)
    v = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    tx = optax.sgd(5e-3, momentum=0.9)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=v["params"],
                       batch_stats=v["batch_stats"],
                       opt_state=tx.init(v["params"]), tx=tx,
                       apply_fn=model.apply)
    step = make_train_step(loss_fn=make_maskformer_loss(3), accumulate=1,
                           donate=False)
    losses = []
    for _ in range(40):
        state, loss = step(state, x, y)
        losses.append(float(loss))
    assert losses[-1] < 0.6 * losses[0], losses[::8]

    sem = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats}, x, train=False)
    acc = float(jnp.mean((jnp.argmax(sem, -1) == y)))
    assert acc > 0.6, acc
