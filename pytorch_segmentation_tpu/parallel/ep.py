"""Expert parallelism for the mixture-of-experts family (nn/moe.py).

The reference has no sparse models and a single distribution strategy
(DDP, reference train.py:108-123); this is the TPU-native scaling axis
for MoE: shard the per-expert parameter stacks over an inner 'expert'
mesh axis, batch over the outer 'data' axis — the GShard placement
(Lepikhin et al. 2020), realized the JAX way like parallel/tp.py:
annotate parameter shardings and let GSPMD insert the collectives.

How the collectives fall out: MoEMlp dispatches tokens with
  expert_in  = einsum('sec,sm->ecm', dispatch, x)      (tokens sharded
                                                         over 'data')
  expert_out = vmapped MLP (weights [E, ...] sharded P('expert', ...))
  y          = einsum('ecm,sec->sm', expert_out, combine)
With the weight stacks sharded on E, GSPMD shards both einsums' E axis,
which turns the token->expert shuffle into the all-to-all-style
exchange over ICI and runs each expert's MLP only on the devices that
own it.

The spec rule is NAME-based on the pytree key path (every leaf under an
['experts'] module shards its leading stacked-expert axis), so one rule
covers params, the f32 grad accumulator, EMA params and the optax
momentum trace uniformly — same approach as parallel/tp.py. Leaves
whose expert count is not divisible by the ep degree fall back to
replicated (correct, just not distributed).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ep_param_spec", "ep_state_shardings", "shard_ep",
           "make_ep_mesh"]


def ep_param_spec(path, leaf, ep: int, axis: str = "expert"):
    """PartitionSpec for one pytree leaf: leaves under an ['experts']
    module shard their LEADING (stacked-expert) axis over `axis`;
    everything else (routers, attention, decoder, ...) replicates."""
    s = path if isinstance(path, str) else jax.tree_util.keystr(path)
    shape = getattr(leaf, "shape", ())
    if "['experts']" in s and len(shape) >= 1 and shape[0] % ep == 0:
        return P(axis, *([None] * (len(shape) - 1)))
    return P()


def ep_state_shardings(state, mesh: Mesh, axis: str = "expert"):
    """NamedSharding tree for a TrainState (params + grad accumulator +
    EMA + optimizer trace share the name-based rule; scalars/stats P())."""
    ep = mesh.shape[axis]
    return jax.tree_util.tree_map_with_path(
        lambda p, l: NamedSharding(mesh, ep_param_spec(p, l, ep, axis)),
        state)


def shard_ep(state, mesh: Mesh, axis: str = "expert"):
    """Place a TrainState onto an expert-parallel mesh: expert stacks
    sharded over `axis`, everything else replicated. Works under
    multi-host jax.distributed via put_tree (mesh.py) — the 'expert'
    axis is innermost, i.e. process-local."""
    from .mesh import put_tree
    return put_tree(ep_state_shardings(state, mesh, axis), state)


def make_ep_mesh(ep: int, devices=None) -> Mesh:
    """(data, expert) 2-D mesh: batch shards over 'data' (outer), expert
    stacks over the inner 'expert' axis so the token->expert all-to-all
    rides the fastest links."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    assert devices.size % ep == 0, (devices.size, ep)
    return Mesh(devices.reshape(devices.size // ep, ep),
                ("data", "expert"))


def ep_zero_state_shardings(state, mesh: Mesh, axis: str = "expert",
                            data_axis: str = "data"):
    """MoE(EP) + ZeRO-1 composed state shardings on a (data, expert)
    mesh: expert parameter stacks shard over 'expert' everywhere they
    appear (params AND their optimizer/accumulator/EMA copies — 2-D
    sharded over expert x data when a second dimension divides), while
    every NON-expert optimizer-state leaf takes the ZeRO data-axis shard
    (parallel/zero.py). Params/batch_stats of non-expert modules stay
    replicated (the DDP-equivalent placement). Feed to put_tree and the
    train step's out_shardings like the zero path."""
    from .zero import zero_leaf_spec
    ep = mesh.shape[axis]
    nd = mesh.shape[data_axis]
    repl = NamedSharding(mesh, P())

    def opt_spec(path, leaf):
        s = jax.tree_util.keystr(path)
        shape = getattr(leaf, "shape", ())
        if "['experts']" in s and len(shape) >= 1 and shape[0] % ep == 0:
            # expert-stacked state: leading dim over 'expert', plus the
            # largest remaining divisible dim over 'data' (2-D ZeRO)
            best_dim, best_size = None, 0
            for d, sz in enumerate(shape[1:], start=1):
                if sz % nd == 0 and sz > best_size:
                    best_dim, best_size = d, sz
            inner = [None] * (len(shape) - 1)
            if best_dim is not None:
                inner[best_dim - 1] = data_axis
            return NamedSharding(mesh, P(axis, *inner))
        return NamedSharding(mesh, zero_leaf_spec(leaf, nd, data_axis))

    def param_spec(path, leaf):
        return NamedSharding(mesh, ep_param_spec(path, leaf, ep, axis))

    def opt(tree):
        return None if tree is None else \
            jax.tree_util.tree_map_with_path(opt_spec, tree)

    return state.replace(
        step=repl,
        params=jax.tree_util.tree_map_with_path(param_spec, state.params),
        batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
        opt_state=opt(state.opt_state),
        grad_acc=opt(state.grad_acc),
        micro_step=repl,
        ema_params=opt(state.ema_params),
    )
