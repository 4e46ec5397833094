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
