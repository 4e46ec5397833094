"""Numerical equivalence of the COMPOSED parallelism stacks (VERDICT r4
#6): the TP x PP x DP 3-axis configuration and the MoE(EP) + ZeRO-1
configuration must compute the same train step as the unsharded
single-device program — not merely "run and stay sharded" (that part is
covered by __graft_entry__._dryrun_tp_pp/_dryrun_moe_zero).

Pattern mirrors tests/test_tp.py::test_tp_step_matches_single_device:
identical init + identical batch, one SGD step on each configuration,
loss and every updated parameter compared. Tolerances as there (BN batch
stats + collective reassociation ~1e-3; a broken composition — e.g. a
missing all-reduce across one of the three axes — would be O(1))."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import SegFormer
from pytorch_segmentation_tpu.parallel import (ep_zero_state_shardings,
                                               make_ep_mesh,
                                               tp_param_spec)
from pytorch_segmentation_tpu.parallel.mesh import put_tree


def _batch(key, b, hw=32):
    imgs = jax.random.normal(key, (b, hw, hw, 3))
    segs = (jax.random.uniform(key, (b, hw, hw)) * 3).astype(jnp.int32)
    return imgs, segs


def _leaves_close(pa, pb, rtol=0.05, atol=5e-3):
    la, lb = jax.tree.leaves(pa), jax.tree.leaves(pb)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)


def test_tp_pp_dp_matches_single_device():
    """(2, 2, 2) (data, pipe, model) mesh: SegFormer tiny-d4 with the
    stage-3 stack pipelined over 'pipe' (shard_map GPipe), non-stacked
    transformer weights column/row-sharded over 'model', batch over
    'data' — one SGD step must match the same model executed unsharded
    (plain scan over the stacked blocks) on one device."""
    devs = jax.devices()
    assert len(devs) >= 8
    mesh = Mesh(np.asarray(devs[:8]).reshape(2, 2, 2),
                ("data", "pipe", "model"))
    imgs, segs = _batch(jax.random.PRNGKey(5), b=4)
    tx = optax.sgd(0.01, momentum=0.9)

    results = []
    for sharded in (True, False):
        model = SegFormer(num_classes=3, variant="tiny-d4",
                          dtype=jnp.float32, scan_blocks=True,
                          pp_mesh=mesh if sharded else None,
                          pp_microbatches=2 if sharded else 0)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 32, 32, 3)), tx,
                                   accumulate=1)
        if sharded:
            def spec(path, leaf):
                s = jtu.keystr(path)
                if "['stack']" in s:
                    nd = getattr(leaf, "ndim", 0)
                    return NamedSharding(mesh,
                                         P("pipe", *([None] * (nd - 1))))
                return NamedSharding(mesh,
                                     tp_param_spec(path, leaf, 2, "model"))
            state = put_tree(jtu.tree_map_with_path(spec, state), state)
            bi = jax.device_put(imgs, NamedSharding(mesh, P("data")))
            bs = jax.device_put(segs, NamedSharding(mesh, P("data")))
        else:
            bi, bs = imgs, segs
        step = make_train_step(accumulate=1, donate=False)
        state, loss = step(state, bi, bs)
        results.append((float(loss),
                        jax.tree.map(np.asarray, state.params)))

    (l_sh, p_sh), (l_1, p_1) = results
    assert abs(l_sh - l_1) < 1e-3, (l_sh, l_1)
    _leaves_close(p_sh, p_1)


def test_moe_ep_zero_matches_single_device():
    """(2, 4) (data, expert) mesh with ZeRO-1 optimizer-state sharding:
    expert stacks shard over 'expert', non-expert optimizer state shards
    over 'data' (ep_zero_state_shardings). Two accumulate=2 micro-steps
    (crossing the update boundary) must match the unsharded single-device
    trajectory: same loss at the update step, same updated params —
    including the expert stacks and the router."""
    devs = jax.devices()
    assert len(devs) >= 8
    imgs, segs = _batch(jax.random.PRNGKey(6), b=4)
    tx = optax.sgd(0.01, momentum=0.9)

    results = []
    for sharded in (True, False):
        model = SegFormer(num_classes=3, variant="tiny", dtype=jnp.float32,
                          moe_experts=4, moe_top_k=2)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 32, 32, 3)), tx,
                                   accumulate=2)
        if sharded:
            mesh = make_ep_mesh(4, devs[:8])      # (2, 4) (data, expert)
            shardings = ep_zero_state_shardings(state, mesh)
            state = put_tree(shardings, state)
            step = make_train_step(
                accumulate=2, donate=False,
                out_shardings=(shardings, NamedSharding(mesh, P())))
            bi = jax.device_put(imgs, NamedSharding(mesh, P("data")))
            bs = jax.device_put(segs, NamedSharding(mesh, P("data")))
        else:
            step = make_train_step(accumulate=2, donate=False)
            bi, bs = imgs, segs
        state, _ = step(state, bi, bs)           # accumulate micro-step
        state, loss = step(state, bi, bs)        # update micro-step
        assert int(state.step) == 1, int(state.step)
        results.append((float(loss),
                        jax.tree.map(np.asarray, state.params)))

    (l_sh, p_sh), (l_1, p_1) = results
    assert abs(l_sh - l_1) < 1e-3, (l_sh, l_1)
    _leaves_close(p_sh, p_1)
