"""ZeRO-1 optimizer-state sharding (parallel/zero.py): equivalence with
the replicated-state trajectory on the 8-device virtual CPU mesh, shard
persistence across steps, and the Trainer --zero path end to end.

The reference replicates optimizer state per GPU (DDP, reference
train.py:108-123); this validates the beyond-reference weight-update
sharding: optimizer trace / grad accumulator / EMA sharded P('data'),
output layout pinned via the train step's out_shardings."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import SegFormer
from pytorch_segmentation_tpu.parallel import (shard_zero, zero_leaf_spec,
                                               zero_state_shardings)
from pytorch_segmentation_tpu.parallel.mesh import put_replicated_tree


def _data_mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("data",))


def _state(accumulate=1, ema=False):
    model = SegFormer(num_classes=3, variant="tiny", dtype=jnp.float32)
    tx = optax.sgd(0.01, momentum=0.9)
    return create_train_state(model, jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 3)), tx,
                              accumulate=accumulate, ema=ema)


def _batch(key, b=8):
    imgs = jax.random.normal(key, (b, 32, 32, 3))
    segs = (jax.random.uniform(key, (b, 32, 32)) * 3).astype(jnp.int32)
    return imgs, segs


def test_zero_leaf_spec():
    # largest divisible dim wins (HWIO conv kernel: O)
    k = jnp.zeros((3, 3, 64, 128))
    assert zero_leaf_spec(k, 8) == P(None, None, None, "data")
    # vector: its only axis
    assert zero_leaf_spec(jnp.zeros((64,)), 8) == P("data")
    # nothing divisible -> replicated (correct, just not distributed)
    assert zero_leaf_spec(jnp.zeros((21,)), 8) == P()
    assert zero_leaf_spec(jnp.zeros(()), 8) == P()
    # ties to the LARGEST divisible dim, not the first
    assert zero_leaf_spec(jnp.zeros((8, 512)), 8) == P(None, "data")


def test_zero_step_matches_replicated():
    """3 train-step calls with accumulate=2 + EMA on the 8-device 'data'
    mesh: ZeRO-sharded optimizer state must reproduce the replicated-state
    trajectory (same batches, same mesh — only the state placement and the
    pinned output shardings differ)."""
    mesh = _data_mesh()
    batches = [_batch(jax.random.PRNGKey(i)) for i in range(3)]
    results = []
    for use_zero in (True, False):
        state = _state(accumulate=2, ema=True)
        if use_zero:
            shardings = zero_state_shardings(state, mesh)
            state = shard_zero(state, mesh)
            step = make_train_step(
                accumulate=2, donate=False, ema_decay=0.99,
                out_shardings=(shardings, NamedSharding(mesh, P())))
        else:
            state = put_replicated_tree(NamedSharding(mesh, P()), state)
            step = make_train_step(accumulate=2, donate=False,
                                   ema_decay=0.99)
        losses = []
        for imgs, segs in batches:
            bi = jax.device_put(imgs, NamedSharding(mesh, P("data")))
            bs = jax.device_put(segs, NamedSharding(mesh, P("data")))
            state, loss = step(state, bi, bs)
            losses.append(float(loss))
        results.append((losses, jax.tree.map(np.asarray, state.params),
                        jax.tree.map(np.asarray, state.ema_params),
                        jax.tree.map(np.asarray, state.opt_state)))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-5)
    for i in (1, 2, 3):  # params, ema, optimizer trace
        for a, b in zip(jax.tree.leaves(results[0][i]),
                        jax.tree.leaves(results[1][i])):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_zero_sharding_persists_and_params_replicated():
    """After steps, the optimizer trace / grad accumulator / EMA leaves
    must KEEP their 1/8 'data' shards (the out_shardings pin) and the
    params must stay replicated (full per-device shards)."""
    mesh = _data_mesh()
    state = _state(accumulate=2, ema=True)
    shardings = zero_state_shardings(state, mesh)
    state = shard_zero(state, mesh)
    step = make_train_step(accumulate=2, donate=False, ema_decay=0.99,
                           out_shardings=(shardings,
                                          NamedSharding(mesh, P())))
    for i in range(2):
        imgs, segs = _batch(jax.random.PRNGKey(i))
        bi = jax.device_put(imgs, NamedSharding(mesh, P("data")))
        bs = jax.device_put(segs, NamedSharding(mesh, P("data")))
        state, _ = step(state, bi, bs)

    def shard_fraction(leaf):
        return (leaf.addressable_shards[0].data.size, leaf.size)

    # a big conv kernel's momentum + accumulator + EMA: 1/8 per device
    trace = jax.tree.leaves(state.opt_state)
    big = [l for l in trace if l.ndim == 4 and l.size % 8 == 0]
    assert big, "no shardable momentum leaves found"
    n_shard, n_full = shard_fraction(big[0])
    assert n_shard * 8 == n_full, (n_shard, n_full)
    acc = [l for l in jax.tree.leaves(state.grad_acc)
           if l.ndim == 4 and l.size % 8 == 0]
    n_shard, n_full = shard_fraction(acc[0])
    assert n_shard * 8 == n_full, (n_shard, n_full)
    # params replicated: every device holds the full leaf
    p = [l for l in jax.tree.leaves(state.params) if l.ndim == 4][0]
    n_shard, n_full = shard_fraction(p)
    assert n_shard == n_full, (n_shard, n_full)


def test_trainer_zero_e2e(tmp_path, synthetic_coco):
    """train.py --zero path: Trainer on the default data mesh with ZeRO
    state sharding trains an epoch, state stays consumable by the eval
    stack, and a checkpoint save round-trips."""
    from pytorch_segmentation_tpu.data import (CocoDataset, DataLoader,
                                               Fetcher, PostFetch)
    from pytorch_segmentation_tpu.engine import Trainer, test

    ds = CocoDataset(osp.join(synthetic_coco, "train.json"),
                     img_size=(64, 64), augments=False)
    loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=1, seed=0)
    model = SegFormer(num_classes=len(ds.classes), variant="tiny",
                      dtype=jnp.float32)
    trainer = Trainer(model, Fetcher(loader, PostFetch()),
                      workdir=str(tmp_path), accumulate=2, lr=1e-3,
                      log=False, zero=True)
    loss = trainer.step()
    assert np.isfinite(loss)
    # the optimizer trace is genuinely distributed over the 8 devices
    n = dict(trainer.mesh.shape)["data"]
    big = [l for l in jax.tree.leaves(trainer.state.opt_state)
           if l.ndim == 4 and l.size % n == 0]
    assert big and big[0].addressable_shards[0].data.size * n == big[0].size
    trainer.save()
    assert osp.exists(osp.join(str(tmp_path), "last.ckpt"))
    val = CocoDataset(osp.join(synthetic_coco, "val.json"),
                      img_size=(64, 64), augments=False)
    vf = Fetcher(DataLoader(val, batch_size=8, num_workers=1), PostFetch())
    miou = test(trainer.model, vf, mesh=trainer.mesh,
                show_first_batch=False, log=False)
    assert 0.0 <= miou <= 1.0
