"""Data parallelism: sharded-vs-single-device equivalence of the train step
and eval metrics over the 8-device virtual CPU mesh (SURVEY.md §4:
'identical-loss test of sharded vs single-device step')."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_eval_step,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import UNet
from pytorch_segmentation_tpu.parallel import (data_sharding, make_mesh,
                                               replicated_sharding)


def _setup(mesh, accumulate=1):
    model = UNet(num_classes=3, dtype=jnp.float32)
    tx = optax.sgd(0.01, momentum=0.9)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), tx,
                               accumulate=accumulate)
    return jax.device_put(state, replicated_sharding(mesh))


def _batch(key, b=8):
    imgs = jax.random.normal(key, (b, 32, 32, 3))
    segs = (jax.random.uniform(key, (b, 32, 32)) * 3).astype(jnp.int32)
    return imgs, segs


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_sharded_step_matches_single_device():
    devs = jax.devices()
    mesh8 = Mesh(np.asarray(devs), ("data",))
    mesh1 = Mesh(np.asarray(devs[:1]), ("data",))

    imgs, segs = _batch(jax.random.PRNGKey(42))
    losses, params = [], []
    for mesh in (mesh8, mesh1):
        state = _setup(mesh)
        step = make_train_step(accumulate=1, donate=False)
        bi = jax.device_put(imgs, data_sharding(mesh))
        bs = jax.device_put(segs, data_sharding(mesh))
        state, loss = step(state, bi, bs)
        losses.append(float(loss))
        params.append(jax.tree.map(np.asarray, state.params))
    # XLA computes sharded BN batch statistics with per-shard partials, so
    # grads differ from single-device by ~1e-3 relative (measured, amplified
    # through the BN-variance backward). A real sharding bug (missing mean
    # over shards) would show as an 8x gradient factor => param diffs of
    # O(lr * grad * 7) ~ 1e0, far above these tolerances.
    assert abs(losses[0] - losses[1]) < 1e-3, losses
    for a, b in zip(jax.tree.leaves(params[0]), jax.tree.leaves(params[1])):
        np.testing.assert_allclose(a, b, rtol=0.05, atol=5e-3)


def test_sharded_eval_metrics_match():
    devs = jax.devices()
    mesh8 = Mesh(np.asarray(devs), ("data",))
    mesh1 = Mesh(np.asarray(devs[:1]), ("data",))
    imgs, segs = _batch(jax.random.PRNGKey(7))
    results = []
    for mesh in (mesh8, mesh1):
        state = _setup(mesh)
        eval_step = make_eval_step(num_classes=3)
        bi = jax.device_put(imgs, data_sharding(mesh))
        bs = jax.device_put(segs, data_sharding(mesh))
        loss, tp, fn, fp = eval_step(state, bi, bs, 6)  # 2 padded
        results.append((float(loss), np.asarray(tp), np.asarray(fn),
                        np.asarray(fp)))
    assert abs(results[0][0] - results[1][0]) < 1e-5
    for a, b in zip(results[0][1:], results[1][1:]):
        np.testing.assert_array_equal(a, b)
    # padded samples excluded: total counted pixels = 6 * 32 * 32
    tp, fn, fp = results[0][1:]
    assert (tp + fn).sum() == 6 * 32 * 32


def test_grad_accumulation_equivalence():
    """Reference every-k-batches semantics: with accumulate=2, the first
    call only accumulates (params untouched, step==0); feeding the SAME
    batch twice, the update applied on call 2 equals the accumulate=1
    update exactly (train-mode BN uses batch stats, so the two passes
    produce identical grads and their mean is the single-batch grad)."""
    mesh = make_mesh()
    imgs, segs = _batch(jax.random.PRNGKey(3))
    bi = jax.device_put(imgs, data_sharding(mesh))
    bs = jax.device_put(segs, data_sharding(mesh))

    state_a = _setup(mesh)
    step_a = make_train_step(accumulate=1, donate=False)
    state_a, loss_a = step_a(state_a, bi, bs)

    state_b = _setup(mesh, accumulate=2)
    step_b = make_train_step(accumulate=2, donate=False)
    params0 = jax.tree.map(np.asarray, state_b.params)
    state_b, loss_b = step_b(state_b, bi, bs)
    # call 1: pure accumulation — no optimizer update
    assert int(state_b.step) == 0
    for a, b in zip(jax.tree.leaves(params0),
                    jax.tree.leaves(jax.tree.map(np.asarray, state_b.params))):
        np.testing.assert_array_equal(a, b)
    state_b, loss_b = step_b(state_b, bi, bs)
    assert int(state_b.step) == 1
    assert abs(float(loss_a) - float(loss_b)) < 1e-5
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, state_a.params)),
                    jax.tree.leaves(jax.tree.map(np.asarray, state_b.params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_accumulate_on_2d_mesh_no_deadlock():
    """Regression (VERDICT r2 Weak #1 / MULTICHIP_r02 ok:false): accumulate=2
    on the 2-D (data, space) mesh. The round-2 lax.cond-gated optimizer
    update conditionally executed a program region carrying collectives and
    deadlocked the conv halo-exchange CollectivePermute rendezvous (4/8
    threads). The branchless select must run BOTH calls — the skip call and
    the boundary call that applies the update — to completion, and the
    trajectory must still match accumulate=1 exactly."""
    devs = jax.devices()
    mesh2d = make_mesh(devs, spatial=2)   # 4x2 (data, space)
    imgs, segs = _batch(jax.random.PRNGKey(11))
    bi = jax.device_put(imgs, data_sharding(mesh2d))
    bs = jax.device_put(segs, data_sharding(mesh2d))

    state = _setup(mesh2d, accumulate=2)
    step = make_train_step(accumulate=2, donate=False)
    state, loss = step(state, bi, bs)        # skip call (accumulate only)
    assert int(state.step) == 0
    state, loss = step(state, bi, bs)        # boundary call (update applies)
    assert int(state.step) == 1
    assert np.isfinite(float(loss))
    # same-batch-twice trajectory equals one accumulate=1 update (train-mode
    # BN => identical grads; their mean is the single-batch grad)
    ref = _setup(mesh2d)
    ref, ref_loss = make_train_step(accumulate=1, donate=False)(ref, bi, bs)
    assert abs(float(loss) - float(ref_loss)) < 1e-5
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, ref.params)),
                    jax.tree.leaves(jax.tree.map(np.asarray, state.params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_spatial_sharding_2d_mesh():
    """(data, space) 2-D mesh: batch sharded on batch+H axes; XLA inserts
    conv halo exchanges. Loss matches the 1-D mesh within BN-reassociation
    noise (SURVEY.md §5 spatial-sharding extension)."""
    devs = jax.devices()
    mesh2d = make_mesh(devs, spatial=2)
    assert mesh2d.axis_names == ("data", "space")
    imgs, segs = _batch(jax.random.PRNGKey(9))
    losses = []
    for mesh in (mesh2d, Mesh(np.asarray(devs[:1]), ("data",))):
        state = _setup(mesh)
        step = make_train_step(accumulate=1, donate=False)
        bi = jax.device_put(imgs, data_sharding(mesh))
        bs = jax.device_put(segs, data_sharding(mesh))
        state, loss = step(state, bi, bs)
        losses.append(float(loss))
    assert abs(losses[0] - losses[1]) < 1e-3, losses


def test_segformer_sharded_step_matches_single_device():
    """The attention-based family on the 8-device data mesh: the
    (B,H,W,C)<->(B,N,C) token reshapes and the split-fuse decoder must
    shard over batch without cross-device batch mixing. Same
    equivalence and tolerances as the UNet test above."""
    from pytorch_segmentation_tpu.models import SegFormer

    devs = jax.devices()
    mesh8 = Mesh(np.asarray(devs), ("data",))
    mesh1 = Mesh(np.asarray(devs[:1]), ("data",))

    imgs, segs = _batch(jax.random.PRNGKey(3))
    losses, params = [], []
    for mesh in (mesh8, mesh1):
        model = SegFormer(num_classes=3, variant="tiny", dtype=jnp.float32)
        tx = optax.sgd(0.01, momentum=0.9)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 32, 32, 3)), tx)
        state = jax.device_put(state, replicated_sharding(mesh))
        step = make_train_step(accumulate=1, donate=False)
        bi = jax.device_put(imgs, data_sharding(mesh))
        bs = jax.device_put(segs, data_sharding(mesh))
        state, loss = step(state, bi, bs)
        losses.append(float(loss))
        params.append(jax.tree.map(np.asarray, state.params))
    assert abs(losses[0] - losses[1]) < 1e-3, losses
    for a, b in zip(jax.tree.leaves(params[0]), jax.tree.leaves(params[1])):
        np.testing.assert_allclose(a, b, rtol=0.05, atol=5e-3)
