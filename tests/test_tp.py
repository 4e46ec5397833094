"""Tensor parallelism (parallel/tp.py): tp x dp sharded train step vs
single-device equivalence for SegFormer on the 8-device virtual CPU mesh.

The reference has no model-parallel axis at all (DDP only, reference
train.py:108-123); this validates the beyond-reference Megatron-style
sharding: column/row-parallel attention + MixFFN weights over 'model',
batch over 'data', XLA-inserted all-reduces."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import SegFormer
from pytorch_segmentation_tpu.parallel import (make_tp_mesh, shard_tp,
                                               tp_param_spec)


def _state(accumulate=1):
    model = SegFormer(num_classes=3, variant="tiny", dtype=jnp.float32)
    tx = optax.sgd(0.01, momentum=0.9)
    return create_train_state(model, jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 3)), tx,
                              accumulate=accumulate)


def _batch(key, b=8):
    imgs = jax.random.normal(key, (b, 32, 32, 3))
    segs = (jax.random.uniform(key, (b, 32, 32)) * 3).astype(jnp.int32)
    return imgs, segs


def test_tp_spec_rules():
    state = _state()
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    specs = {jax.tree_util.keystr(p): tp_param_spec(p, l, tp=4)
             for p, l in flat}
    # column-parallel: q/kv/fc1 kernels sharded on the OUTPUT dim
    assert specs["['backbone']['block1_0']['attn']['q']['kernel']"] == \
        P(None, "model")
    assert specs["['backbone']['block1_0']['ffn']['fc1']['kernel']"] == \
        P(None, "model")
    # row-parallel: proj/fc2 kernels sharded on the INPUT dim
    assert specs["['backbone']['block1_0']['attn']['proj']['kernel']"] == \
        P("model", None)
    assert specs["['backbone']['block1_0']['ffn']['fc2']['kernel']"] == \
        P("model", None)
    # depthwise conv: feature axis
    assert specs["['backbone']['block1_0']['ffn']['dwconv']['kernel']"] == \
        P(None, None, None, "model")
    # everything structural stays replicated
    assert specs["['backbone']['patch_embed1_proj']['kernel']"] == P()
    assert specs["['backbone']['block1_0']['ln1']['scale']"] == P()
    assert specs["['cls_conv']['kernel']"] == P()
    # indivisible sharded dim (stage-1 q kernel is 16x16 in 'tiny';
    # tp=32 cannot divide it) falls back to replicated
    q = state.params["backbone"]["block1_0"]["attn"]["q"]["kernel"]
    assert tp_param_spec("['attn']['q']['kernel']", q, tp=32) == P()


def test_tp_step_matches_single_device():
    """2x4 (data, model) mesh: one SGD train step — loss and every updated
    param (including the tp-sharded attention/FFN kernels) must match the
    single-device trajectory. Tolerances as in test_parallel.py (BN batch
    stats + all-reduce reassociation ~1e-3 relative; a broken TP rule —
    e.g. a row-parallel matmul missing its all-reduce — would be O(1))."""
    devs = jax.devices()
    mesh_tp = make_tp_mesh(4, devs)          # 2 x 4 (data, model)
    assert mesh_tp.axis_names == ("data", "model")
    mesh1 = Mesh(np.asarray(devs[:1]).reshape(1, 1), ("data", "model"))

    imgs, segs = _batch(jax.random.PRNGKey(42))
    losses, params = [], []
    for mesh in (mesh_tp, mesh1):
        state = shard_tp(_state(), mesh)
        step = make_train_step(accumulate=1, donate=False)
        bi = jax.device_put(imgs, NamedSharding(mesh, P("data")))
        bs = jax.device_put(segs, NamedSharding(mesh, P("data")))
        state, loss = step(state, bi, bs)
        losses.append(float(loss))
        params.append(jax.tree.map(np.asarray, state.params))
    assert abs(losses[0] - losses[1]) < 1e-3, losses
    for a, b in zip(jax.tree.leaves(params[0]), jax.tree.leaves(params[1])):
        np.testing.assert_allclose(a, b, rtol=0.05, atol=5e-3)


def test_tp_sharding_is_actually_distributed():
    """Guard against the rules silently matching nothing: after shard_tp
    on the 2x4 mesh, a column-parallel kernel must have per-device shards
    1/4 its columns, and grads/updated params must KEEP that sharding
    through the step (GSPMD keeps dL/dW co-located with W)."""
    mesh = make_tp_mesh(4)
    state = shard_tp(_state(), mesh)
    k = state.params["backbone"]["block4_0"]["ffn"]["fc1"]["kernel"]
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(k.shape[0], k.shape[1] // 4)}, shard_shapes

    imgs, segs = _batch(jax.random.PRNGKey(1))
    bi = jax.device_put(imgs, NamedSharding(mesh, P("data")))
    bs = jax.device_put(segs, NamedSharding(mesh, P("data")))
    state, _ = make_train_step(accumulate=1, donate=False)(state, bi, bs)
    k2 = state.params["backbone"]["block4_0"]["ffn"]["fc1"]["kernel"]
    shard_shapes = {s.data.shape for s in k2.addressable_shards}
    assert shard_shapes == {(k2.shape[0], k2.shape[1] // 4)}, shard_shapes


def test_trainer_tp_e2e(tmp_path, synthetic_coco):
    """train.py --tp 4 path end to end: Trainer on a (2, 4) (data, model)
    mesh trains a SegFormer epoch with the transformer weights genuinely
    sharded, then the eval stack consumes the TP-sharded params."""
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
                      workdir=str(tmp_path), accumulate=1, lr=1e-3,
                      log=False, mesh=make_tp_mesh(4))
    loss = trainer.step()
    assert np.isfinite(loss)
    k = trainer.state.params["backbone"]["block4_0"]["ffn"]["fc1"]["kernel"]
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(k.shape[0], k.shape[1] // 4)}, shard_shapes
    val = CocoDataset(osp.join(synthetic_coco, "val.json"),
                      img_size=(64, 64), augments=False)
    vf = Fetcher(DataLoader(val, batch_size=8, num_workers=1), PostFetch())
    miou = test(trainer.model, vf, mesh=trainer.mesh,
                show_first_batch=False, log=False)
    assert 0.0 <= miou <= 1.0
