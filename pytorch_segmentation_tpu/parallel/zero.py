"""ZeRO-1 optimizer-state sharding (weight-update sharding).

The reference replicates optimizer state per GPU, like its DDP strategy
replicates everything (reference train.py:108-123). On TPU pods the
f32 per-parameter trees — the optax momentum/Adam moments, the
cross-batch f32 grad accumulator (engine/steps.py accumulate>1) and the
EMA average (--ema) — are the memory-dominant replicas when training
bf16, and none of them needs to be replicated: each device only ever
needs the shard it updates (ZeRO stage 1, Rajbhandari et al. 2020; the
TPU formulation is "weight update sharding", Xu et al. 2020).

The JAX/GSPMD realization needs no engine changes: shard every
optimizer-state leaf over the existing 'data' mesh axis on its largest
divisible dimension, and pin the train step's OUTPUT shardings to the
same layout (jit out_shardings). The partitioner then
  - reduce-scatters the gradients into the shard each device owns
    (instead of an all-reduce producing a replicated gradient),
  - runs the momentum/param update math on 1/N of the elements,
  - all-gathers only the UPDATED params back to replicated.
Bytes on the wire are the same as the plain all-reduce (RS + AG is how
an all-reduce is lowered anyway); optimizer memory and update FLOPs
drop to 1/N.

Composition: --zero applies to pure data-parallel (or data x space)
meshes. The tensor/pipeline-parallel paths (parallel/tp.py, pp.py)
already shard their optimizer state by construction — their momentum
trees inherit the weight shardings — so ZeRO over 'data' on top of them
is a different (2-D state sharding) design, deliberately not wired.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["zero_leaf_spec", "zero_state_shardings", "shard_zero"]


def zero_leaf_spec(leaf, n: int, axis: str = "data") -> P:
    """PartitionSpec sharding `leaf`'s largest n-divisible dimension over
    `axis`; replicated when no dimension divides (scalars, tiny leaves —
    correct, just not distributed). Conv kernels (HWIO) usually shard on
    O, biases/BN vectors on their only axis."""
    shape = getattr(leaf, "shape", ())
    best_dim, best_size = None, 0
    for d, s in enumerate(shape):
        if s % n == 0 and s > best_size:
            best_dim, best_size = d, s
    if best_dim is None:
        return P()
    spec = [None] * len(shape)
    spec[best_dim] = axis
    return P(*spec)


def zero_state_shardings(state, mesh: Mesh, axis: str = "data"):
    """A TrainState-shaped tree of NamedShardings: optimizer trace, grad
    accumulator and EMA leaves sharded over `axis` (zero_leaf_spec);
    params / batch_stats / counters replicated. Feed it to put_tree for
    placement AND to the train step's out_shardings so the layout is
    pinned across steps (engine/trainer.py --zero wiring)."""
    n = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def zs(leaf):
        return NamedSharding(mesh, zero_leaf_spec(leaf, n, axis))

    def opt(tree):
        return None if tree is None else jax.tree.map(zs, tree)

    def replicate(tree):
        return jax.tree.map(lambda _: repl, tree)

    return state.replace(
        step=repl,
        params=replicate(state.params),
        batch_stats=replicate(state.batch_stats),
        opt_state=opt(state.opt_state),
        grad_acc=opt(state.grad_acc),
        micro_step=repl,
        ema_params=opt(state.ema_params),
    )


def shard_zero(state, mesh: Mesh, axis: str = "data"):
    """Place a TrainState with ZeRO-1 optimizer-state sharding over
    `mesh`. Multi-host: the 'data' axis spans processes, so a sharded
    leaf's local portion is a SLICE of the (identical) host copy —
    make_array_from_callback slices it per device (unlike put_tree,
    whose multi-host path assumes process-local shard axes)."""
    import numpy as np
    shardings = zero_state_shardings(state, mesh, axis)
    if jax.process_count() == 1:
        return jax.device_put(state, shardings)

    def place(s, x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s,
                                            lambda idx: x[idx])

    return jax.tree.map(place, shardings, state)
