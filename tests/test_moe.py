"""MoE FFN (nn/moe.py) + expert parallelism (parallel/ep.py) units:
dense-dispatch routing brute-forced against a per-token/per-expert
manual evaluation, capacity-overflow drops, the Switch load-balance
loss, EP spec rules, and an 8-device (data, expert) equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_segmentation_tpu.nn.moe import MoEMlp
from pytorch_segmentation_tpu.parallel.ep import (ep_param_spec,
                                                  make_ep_mesh)


def _x(b=2, h=4, w=4, c=8, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, h, w, c))


def _manual_moe(variables, x, top_k):
    """Reference evaluation: per-token softmax router, top-k experts
    applied densely, GShard-normalized combine."""
    p = variables["params"]
    xt = np.asarray(x, np.float64).reshape(-1, x.shape[-1])
    logits = xt @ np.asarray(p["router"]["kernel"], np.float64) \
        + np.asarray(p["router"]["bias"], np.float64)
    z = np.exp(logits - logits.max(-1, keepdims=True))
    probs = z / z.sum(-1, keepdims=True)
    e = probs.shape[-1]
    k1 = np.asarray(p["experts"]["fc1"]["kernel"], np.float64)
    b1 = np.asarray(p["experts"]["fc1"]["bias"], np.float64)
    k2 = np.asarray(p["experts"]["fc2"]["kernel"], np.float64)
    b2 = np.asarray(p["experts"]["fc2"]["bias"], np.float64)

    def gelu(v):
        from math import erf
        return v * 0.5 * (1.0 + np.vectorize(erf)(v / np.sqrt(2.0)))

    ys = np.stack([gelu(xt @ k1[i] + b1[i]) @ k2[i] + b2[i]
                   for i in range(e)])              # [E, S, C]
    order = np.argsort(-probs, axis=-1)[:, :top_k]  # [S, k]
    out = np.zeros_like(xt)
    for s in range(xt.shape[0]):
        g = probs[s, order[s]]
        g = g / g.sum()
        for r in range(top_k):
            out[s] += g[r] * ys[order[s, r], s]
    return out.reshape(x.shape)


def test_moe_matches_manual_dense_eval():
    """With generous capacity (no drops) the dense-dispatch einsum path
    must equal the per-token manual top-k evaluation."""
    x = _x()
    for top_k in (1, 2):
        m = MoEMlp(dim=8, hidden=16, num_experts=4, top_k=top_k,
                   capacity_factor=4.0, dtype=jnp.float32)
        variables = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(variables, x)
        ref = _manual_moe(variables, x, top_k)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4,
                                   atol=1e-5)


def test_moe_capacity_drops_tokens():
    """cap = ceil(k*S/E*cf); with cf shrunk far below 1 some tokens must
    overflow and their MoE output is exactly zero (they ride the
    residual in the enclosing block)."""
    x = _x(b=1, h=4, w=4, c=8, seed=2)  # S=16
    m = MoEMlp(dim=8, hidden=16, num_experts=4, top_k=1,
               capacity_factor=0.25, dtype=jnp.float32)  # cap=1
    variables = m.init(jax.random.PRNGKey(3), x)
    y = np.asarray(m.apply(variables, x)).reshape(-1, 8)
    zero_rows = np.all(y == 0.0, axis=-1)
    # at most E tokens fit (cap=1 each); the rest must be dropped
    assert zero_rows.sum() >= 16 - 4, zero_rows.sum()
    assert (~zero_rows).sum() >= 1  # but somebody got routed


def test_moe_aux_loss():
    """A zeroed router -> uniform probabilities -> the Switch loss
    reduces to aux_weight exactly (E * sum_e f_e * 1/E = sum_e f_e = 1,
    whatever the tie-broken top-1 assignment)."""
    x = _x(seed=4)
    m = MoEMlp(dim=8, hidden=16, num_experts=4, top_k=2,
               capacity_factor=2.0, aux_weight=0.01, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(5), x)
    p = jax.tree.map(lambda v: v, variables["params"])  # shallow copy tree
    p["router"]["kernel"] = jnp.zeros_like(p["router"]["kernel"])
    variables = {"params": p}
    _, col = m.apply(variables, x, mutable=["moe_losses"])
    aux = jax.tree.leaves(col["moe_losses"])
    assert len(aux) == 1
    np.testing.assert_allclose(float(aux[0]), 0.01, rtol=1e-6)
    # eval-style apply (collection NOT mutable) is a no-op sow
    y = m.apply(variables, x)
    assert np.all(np.isfinite(np.asarray(y)))


def test_ep_param_spec_rules():
    x = _x()
    m = MoEMlp(dim=8, hidden=16, num_experts=4, top_k=1,
               dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(6), x)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    specs = {jax.tree_util.keystr(p): ep_param_spec(p, l, ep=4)
             for p, l in flat}
    assert specs["['experts']['fc1']['kernel']"] == P("expert", None, None)
    assert specs["['experts']['fc1']['bias']"] == P("expert", None)
    assert specs["['experts']['fc2']['kernel']"] == P("expert", None, None)
    assert specs["['router']['kernel']"] == P()
    # indivisible expert count falls back to replicated
    k = variables["params"]["experts"]["fc1"]["kernel"]
    assert ep_param_spec("['experts']['fc1']['kernel']", k, ep=8) == P()


class _TinyMoENet(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = x + MoEMlp(dim=8, hidden=16, num_experts=4, top_k=2,
                       capacity_factor=2.0, dtype=jnp.float32,
                       name="moe")(x)
        return nn.Dense(3, param_dtype=jnp.float32, name="cls")(y)


def test_ep_step_matches_replicated():
    """One SGD step on a 2x4 (data, expert) mesh with the expert stacks
    genuinely sharded must match the replicated trajectory (the einsum
    all-to-all path vs local compute)."""
    devs = jax.devices()
    mesh_ep = make_ep_mesh(4, devs)
    mesh_1 = Mesh(np.asarray(devs).reshape(8, 1), ("data", "expert"))
    x = _x(b=8, seed=7)
    labels = (jax.random.uniform(jax.random.PRNGKey(8), (8, 4, 4)) * 3
              ).astype(jnp.int32)
    net = _TinyMoENet()
    variables = net.init(jax.random.PRNGKey(9), x)
    tx = optax.sgd(0.1, momentum=0.9)

    def loss_fn(params, bx, by):
        logits, col = net.apply({"params": params}, bx,
                                mutable=["moe_losses"])
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, by).mean()
        return ce + sum(jax.tree.leaves(col["moe_losses"]))

    results = []
    for mesh in (mesh_ep, mesh_1):
        specs = jax.tree_util.tree_map_with_path(
            lambda p, l: NamedSharding(
                mesh, ep_param_spec(p, l, mesh.shape["expert"])),
            variables["params"])
        params = jax.device_put(variables["params"], specs)
        opt = jax.device_put(tx.init(variables["params"]),
                             jax.tree.map(lambda _: NamedSharding(
                                 mesh, P()), tx.init(variables["params"])))
        bx = jax.device_put(x, NamedSharding(mesh, P("data")))
        by = jax.device_put(labels, NamedSharding(mesh, P("data")))

        @jax.jit
        def step(params, opt, bx, by):
            loss, grads = jax.value_and_grad(loss_fn)(params, bx, by)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        params, opt, loss = step(params, opt, bx, by)
        results.append((float(loss), jax.tree.map(np.asarray, params)))
    assert abs(results[0][0] - results[1][0]) < 1e-5
    for a, b in zip(jax.tree.leaves(results[0][1]),
                    jax.tree.leaves(results[1][1])):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    # and the sharded run's expert stacks were genuinely 1/4 per device
    sharded = jax.device_put(
        variables["params"],
        jax.tree_util.tree_map_with_path(
            lambda p, l: NamedSharding(mesh_ep, ep_param_spec(p, l, 4)),
            variables["params"]))
    k = sharded["moe"]["experts"]["fc1"]["kernel"]
    shapes = {s.data.shape for s in k.addressable_shards}
    assert shapes == {(1,) + k.shape[1:]}, shapes


def test_moe_segformer_train_step_includes_aux():
    """SegFormer(moe_experts=4): alternate stage-3/4 blocks carry MoE
    FFNs, and the train step's loss equals CE + the sown load-balance
    terms (engine/steps.py 'moe_losses' plumbing)."""
    import optax

    from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                       make_train_step)
    from pytorch_segmentation_tpu.models import SegFormer
    from pytorch_segmentation_tpu.ops.loss import compute_loss

    model = SegFormer(num_classes=3, variant="tiny", dtype=jnp.float32,
                      moe_experts=4, moe_top_k=2)
    tx = optax.sgd(0.01, momentum=0.9)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), tx)
    # MoE replaced the FFN of the (single) stage-3 and stage-4 blocks
    assert "moe" in state.params["backbone"]["block3_0"]
    assert "moe" in state.params["backbone"]["block4_0"]
    assert "ffn" in state.params["backbone"]["block1_0"]  # dense stages

    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    segs = (jax.random.uniform(jax.random.PRNGKey(2), (4, 32, 32)) * 3
            ).astype(jnp.int32)
    step = make_train_step(accumulate=1, donate=False)
    _, loss = step(state, imgs, segs)

    logits, col = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        imgs, train=True, mutable=["batch_stats", "moe_losses"])
    expected = float(compute_loss(logits, segs)) + float(
        sum(jax.tree.leaves(col["moe_losses"])))
    assert abs(float(loss) - expected) < 1e-5, (float(loss), expected)


def test_moe_segformer_trainer_ep_e2e(tmp_path, synthetic_coco):
    """train.py --moe 4 --ep 4 path end to end: Trainer on a (2, 4)
    (data, expert) mesh trains a MoE SegFormer epoch with the expert
    stacks genuinely sharded, then the eval stack consumes the params."""
    import os.path as osp

    from pytorch_segmentation_tpu.data import (CocoDataset, DataLoader,
                                               Fetcher, PostFetch)
    from pytorch_segmentation_tpu.engine import Trainer, test
    from pytorch_segmentation_tpu.models import SegFormer
    from pytorch_segmentation_tpu.parallel import make_ep_mesh

    ds = CocoDataset(osp.join(synthetic_coco, "train.json"),
                     img_size=(64, 64), augments=False)
    loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=1, seed=0)
    model = SegFormer(num_classes=len(ds.classes), variant="tiny",
                      dtype=jnp.float32, moe_experts=4, moe_top_k=2)
    trainer = Trainer(model, Fetcher(loader, PostFetch()),
                      workdir=str(tmp_path), accumulate=1, lr=1e-3,
                      log=False, mesh=make_ep_mesh(4))
    loss = trainer.step()
    assert np.isfinite(loss)
    k = (trainer.state.params["backbone"]["block4_0"]["moe"]["experts"]
         ["fc1"]["kernel"])
    shapes = {s.data.shape for s in k.addressable_shards}
    assert shapes == {(1,) + k.shape[1:]}, shapes
    val = CocoDataset(osp.join(synthetic_coco, "val.json"),
                      img_size=(64, 64), augments=False)
    vf = Fetcher(DataLoader(val, batch_size=8, num_workers=1), PostFetch())
    miou = test(trainer.model, vf, mesh=trainer.mesh,
                show_first_batch=False, log=False)
    assert 0.0 <= miou <= 1.0


def test_upcycle_moe_from_dense(tmp_path):
    """tools/upcycle_moe.py (sparse upcycling): every expert of a
    converted block starts as the dense FFN, all other leaves carry
    over bit-exact, the router keeps a fresh init, and the output
    checkpoint loads through the standard path into a --moe model.
    Because every expert is identical and the combine weights are
    normalized, a kept token's MoE output equals the dense MixFFN
    minus its dwconv — checked at the module level."""
    import os.path as osp
    import sys

    from pytorch_segmentation_tpu.engine.checkpoint import (
        load_model_bundle, save_checkpoint)
    from pytorch_segmentation_tpu.models import SegFormer

    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "tools"))
    from upcycle_moe import upcycle

    dense = SegFormer(num_classes=3, variant="tiny", dtype=jnp.float32)
    dv = dense.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    path = str(tmp_path / "dense.ckpt")
    save_checkpoint(path, dv["params"], dv["batch_stats"], epoch=5)

    out = upcycle(path, num_classes=3, variant="tiny", experts=4, top_k=2)
    p = out["model"]
    # converted stage-3/4 blocks: every expert == the dense ffn
    for blk in ("block3_0", "block4_0"):
        e_k = p["backbone"][blk]["moe"]["experts"]["fc1"]["kernel"]
        d_k = np.asarray(dv["params"]["backbone"][blk]["ffn"]["fc1"]
                         ["kernel"])
        assert e_k.shape == (4,) + d_k.shape
        for e in range(4):
            np.testing.assert_array_equal(e_k[e], d_k)
    # untouched leaves carry over bit-exact
    np.testing.assert_array_equal(
        p["backbone"]["block1_0"]["ffn"]["fc1"]["kernel"],
        np.asarray(dv["params"]["backbone"]["block1_0"]["ffn"]["fc1"]
                   ["kernel"]))
    np.testing.assert_array_equal(
        p["cls_conv"]["kernel"], np.asarray(dv["params"]["cls_conv"]
                                            ["kernel"]))
    assert out["epoch"] == 5 and out["opt_state"] is None

    # loads through the standard checkpoint path into a --moe model
    from flax import serialization
    mpath = str(tmp_path / "moe.ckpt")
    with open(mpath, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    moe_model = SegFormer(num_classes=3, variant="tiny",
                          dtype=jnp.float32, moe_experts=4, moe_top_k=2)
    bundle = load_model_bundle(moe_model, mpath, (64, 64))
    y = moe_model.apply({"params": bundle.params,
                         "batch_stats": bundle.batch_stats},
                        jnp.zeros((1, 64, 64, 3), jnp.float32),
                        train=False)
    assert np.all(np.isfinite(np.asarray(y)))

    # identical experts + normalized gates => kept tokens reproduce the
    # dense FFN (module-level; generous capacity so nothing drops)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 8))
    m = MoEMlp(dim=8, hidden=16, num_experts=4, top_k=2,
               capacity_factor=4.0, dtype=jnp.float32)
    mv = m.init(jax.random.PRNGKey(4), x)
    w = jax.tree.map(lambda v: v, mv["params"])
    for fc in ("fc1", "fc2"):
        for leaf in ("kernel", "bias"):
            one = np.asarray(w["experts"][fc][leaf])[0]
            w["experts"][fc][leaf] = jnp.broadcast_to(
                one, (4,) + one.shape)
    y_moe = m.apply({"params": w}, x)

    def dense_ffn(xx):
        h = xx @ w["experts"]["fc1"]["kernel"][0] \
            + w["experts"]["fc1"]["bias"][0]
        h = jax.nn.gelu(h, approximate=False)
        return h @ w["experts"]["fc2"]["kernel"][0] \
            + w["experts"]["fc2"]["bias"][0]

    np.testing.assert_allclose(np.asarray(y_moe), np.asarray(dense_ffn(x)),
                               rtol=1e-5, atol=1e-6)
