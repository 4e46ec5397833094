"""EMA weight averaging (train.py --ema).

The reference has no weight averaging; this is a framework extension. The
contract under test: state.ema_params advances once per OPTIMIZER UPDATE
(not per loader batch) with ema = d*ema + (1-d)*params, rides the branchless
accumulate select, round-trips through checkpoints under the 'ema' key, and
is served via Trainer.ema_model / load_model_bundle(use_ema=True).
"""

import os.path as osp

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_segmentation_tpu.engine.checkpoint import (load_checkpoint,
                                                        load_model_bundle,
                                                        save_checkpoint)
from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)


class Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return nn.Dense(4)(x)


def _loss(logits, segs):
    return jnp.mean(logits ** 2)


def _make(accumulate, ema_decay, lr=0.1):
    model = Tiny()
    sample = jnp.ones((2, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), sample,
                               optax.sgd(lr), accumulate=accumulate,
                               ema=ema_decay > 0)
    step = make_train_step(loss_fn=_loss, accumulate=accumulate,
                           donate=False, ema_decay=ema_decay)
    return state, step


def _flat(tree):
    return jax.tree.map(np.asarray, tree)


def test_ema_recurrence_accumulate1():
    d = 0.5
    state, step = _make(accumulate=1, ema_decay=d)
    ema = _flat(state.params)
    x = np.random.RandomState(0).randn(2, 3).astype(np.float32)
    segs = np.zeros((2,), np.int32)
    for _ in range(3):
        state, _ = step(state, x, segs)
        ema = jax.tree.map(lambda e, p: d * e + (1 - d) * np.asarray(p),
                           ema, state.params)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            a, np.asarray(b), rtol=1e-6), ema, state.ema_params)
    # the average trails the trajectory (params moved, ema is behind)
    moved = jax.tree.map(lambda e, p: np.abs(e - np.asarray(p)).max(),
                         ema, state.params)
    assert max(jax.tree.leaves(moved)) > 0


def test_ema_updates_once_per_optimizer_update():
    d = 0.9
    state, step = _make(accumulate=2, ema_decay=d)
    x = np.random.RandomState(1).randn(2, 3).astype(np.float32)
    segs = np.zeros((2,), np.int32)
    snapshots = []
    for i in range(4):
        state, _ = step(state, x, segs)
        snapshots.append(_flat(state.ema_params))
    # calls 1 and 3 are accumulation-only: ema must be untouched there
    init_ema = _flat(create_train_state(
        Tiny(), jax.random.PRNGKey(0), jnp.ones((2, 3), jnp.float32),
        optax.sgd(0.1), accumulate=2, ema=True).ema_params)
    jax.tree.map(np.testing.assert_array_equal, snapshots[0], init_ema)
    jax.tree.map(np.testing.assert_array_equal, snapshots[2], snapshots[1])
    # calls 2 and 4 applied the optimizer: ema advanced by the recurrence
    def changed(a, b):
        assert np.abs(a - b).max() > 0
    jax.tree.map(changed, snapshots[1], snapshots[0])
    jax.tree.map(changed, snapshots[3], snapshots[2])
    ema2 = jax.tree.map(lambda e, p: d * e + (1 - d) * np.asarray(p),
                        snapshots[2], state.params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
                 ema2, snapshots[3])


def test_ema_checkpoint_roundtrip(tmp_path):
    state, step = _make(accumulate=1, ema_decay=0.7)
    x = np.random.RandomState(2).randn(2, 3).astype(np.float32)
    state, _ = step(state, x, np.zeros((2,), np.int32))
    path = str(tmp_path / "last.ckpt")
    save_checkpoint(path, state.params, {}, epoch=1, best_miou=0.5,
                    ema=state.ema_params)
    ckpt = load_checkpoint(path)
    assert ckpt["ema"] is not None
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), b), state.ema_params, ckpt["ema"])
    # a checkpoint written without EMA loads as ema=None and
    # load_model_bundle(use_ema=True) refuses it
    path2 = str(tmp_path / "noema.ckpt")
    save_checkpoint(path2, state.params, {})
    assert load_checkpoint(path2)["ema"] is None


def test_trainer_ema_e2e(tmp_path, synthetic_coco):
    from pytorch_segmentation_tpu.data import (CocoDataset, DataLoader,
                                               Fetcher, PostFetch)
    from pytorch_segmentation_tpu.engine import Trainer, test
    from pytorch_segmentation_tpu.models import UNet

    ds = CocoDataset(osp.join(synthetic_coco, "train.json"),
                     img_size=(64, 64), augments=False)
    loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=1, seed=0)
    fetcher = Fetcher(loader, PostFetch())
    model = UNet(num_classes=len(ds.classes), dtype=jnp.float32)
    trainer = Trainer(model, fetcher, workdir=str(tmp_path), accumulate=2,
                      adam=True, lr=1e-3, log=False, ema_decay=0.9)
    trainer.step()
    # ema differs from raw params after an epoch and evaluates sanely
    diffs = jax.tree.map(
        lambda e, p: float(np.abs(np.asarray(e) - np.asarray(p)).max()),
        trainer.state.ema_params, trainer.state.params)
    assert max(jax.tree.leaves(diffs)) > 0
    val = CocoDataset(osp.join(synthetic_coco, "val.json"), img_size=(64, 64),
                      augments=False)
    vf = Fetcher(DataLoader(val, batch_size=8, num_workers=1), PostFetch())
    miou = test(trainer.ema_model, vf, show_first_batch=False, log=False)
    assert 0.0 <= miou <= 1.0
    # checkpoint stores the averaged weights; --ema load path serves them
    trainer.save()
    bundle = load_model_bundle(model, str(tmp_path / "last.ckpt"), (64, 64),
                               use_ema=True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        trainer.state.ema_params, bundle.params)
    with pytest.raises(ValueError):
        save_checkpoint(str(tmp_path / "raw.ckpt"), trainer.state.params, {})
        load_model_bundle(model, str(tmp_path / "raw.ckpt"), (64, 64),
                          use_ema=True)
    # resume restores the average (not re-seeded from raw params)
    trainer2 = Trainer(model, fetcher, workdir=str(tmp_path), accumulate=2,
                       adam=True, lr=1e-3, log=False, ema_decay=0.9,
                       resume=True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        trainer.state.ema_params, trainer2.state.ema_params)
