"""Pipeline parallelism (GPipe-style) for stacked transformer blocks.

Third scaling axis beyond the reference's DDP-only strategy (reference
train.py:108-123): the deep homogeneous block stack of a transformer
stage (SegFormer MiT stage 3 is 18/27/40 blocks deep for b3/b4/b5) is
sharded layer-wise over a mesh `'pipe'` axis, and microbatches stream
through the stages in the classic GPipe schedule (Huang et al. 2019),
realized the TPU way:

  - The stage's parameters are STACKED along a leading layer axis
    (models/segformer.py `scan_blocks`) and sharded `P('pipe')`, so each
    device holds `L / S` contiguous layers — the layer-memory win that
    motivates pipeline parallelism.
  - The schedule is a `lax.scan` over `M + S - 1` ticks inside one
    `jax.shard_map` region; activations hop stage-to-stage with a ring
    `lax.ppermute` that rides ICI neighbor links (never DCN if 'pipe'
    maps to an ICI-contiguous mesh dim).
  - Everything is differentiable: autodiff transposes the forward
    schedule into the reverse pipeline (ppermute reverses direction),
    so `jax.grad` of a loss through `pipeline_blocks` IS pipelined
    backprop — no hand-written backward pass.
  - Composes with data parallelism: on a (data, pipe) mesh each data
    row runs an independent pipeline over its pipe ranks; gradient
    all-reduces over 'data' are inserted by GSPMD outside the
    shard_map region as usual.

Bubble overhead is the standard GPipe `(S - 1) / (M + S - 1)`; pick
`microbatches >= 2 * S` to keep it under ~1/3. The pipelined forward
computes the SAME math as the sequential `lax.scan` over the stack
(tests/test_pp.py asserts forward + gradient equivalence on an
8-device (data=2, pipe=4) CPU mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_pp_mesh", "pipeline_blocks", "pp_state_shardings",
           "shard_pp"]


def make_pp_mesh(pp: int, devices=None) -> Mesh:
    """(data, pipe) 2-D mesh: batch shards over the outer 'data' axis,
    pipeline stages over the inner 'pipe' axis so the per-tick ppermute
    activation hops ride the fastest (ICI-neighbor) links."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    assert devices.size % pp == 0, (devices.size, pp)
    return Mesh(devices.reshape(devices.size // pp, pp), ("data", "pipe"))


def pipeline_blocks(block_fn, stacked_params, x, mesh: Mesh,
                    microbatches: int = 0, axis: str = "pipe",
                    data_axis: str = "data"):
    """Apply a stack of identical residual blocks to `x` with the layer
    stack pipelined over `mesh`'s `axis`.

    block_fn(params_one_layer, h) -> h' must be shape-preserving (a
    residual transformer block). `stacked_params` is a pytree whose
    leaves carry a leading layer axis of size L with L % S == 0 (S =
    mesh.shape[axis]); each pipeline stage applies its L/S local layers
    per tick. `x` is the GLOBAL [B, ...] activation, batch sharded over
    `data_axis` (replicated over `axis`); the result has the same
    global shape/sharding.
    """
    S = mesh.shape[axis]
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    assert L % S == 0, (L, S)
    M = microbatches or 2 * S
    dp = mesh.shape.get(data_axis, 1)
    assert (x.shape[0] // dp) % M == 0, (
        f"local batch {x.shape[0]}/{dp} must divide into {M} microbatches")

    def per_device(p_local, xb):
        # p_local: this stage's [L/S, ...] layer slice; xb: this data
        # row's [b_loc, ...] batch shard (replicated over 'pipe').
        s = jax.lax.axis_index(axis)
        mb = xb.shape[0] // M
        xs = xb.reshape((M, mb) + xb.shape[1:])
        # input injection stream, padded with S-1 bubble ticks
        inj = jnp.concatenate(
            [xs, jnp.zeros((S - 1,) + xs.shape[1:], xs.dtype)], axis=0)

        def apply_local(h):
            def body(c, p):
                return block_fn(p, c), None
            y, _ = jax.lax.scan(body, h, p_local)
            return y

        def tick(carry, xin):
            # stage 0 takes the fresh microbatch; others take the
            # activation handed over by the previous stage last tick
            cur = jnp.where(s == 0, xin, carry)
            y = apply_local(cur)
            nxt = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % S) for i in range(S)])
            return nxt, y

        _, ys = jax.lax.scan(tick, jnp.zeros_like(xs[0]), inj)
        # the last stage finishes microbatch t-(S-1) at tick t
        out = ys[S - 1:]
        out = jnp.where(s == S - 1, out, jnp.zeros_like(out))
        # replicate the finished microbatches back to every pipe rank
        # (masked psum == broadcast from the last stage)
        out = jax.lax.psum(out, axis)
        return out.reshape(xb.shape)

    pspecs = jax.tree.map(lambda _: P(axis), stacked_params)
    return jax.shard_map(
        per_device, mesh=mesh, in_specs=(pspecs, P(data_axis)),
        out_specs=P(data_axis), check_vma=False)(stacked_params, x)


def pp_state_shardings(state, mesh: Mesh, axis: str = "pipe"):
    """NamedSharding tree for a TrainState on a (data, pipe) mesh: leaves
    of a stacked block stack (path contains ['stack'], leading dim
    divisible by the pipe degree) shard layer-wise over `axis`; all other
    leaves replicate. Covers params, the f32 grad accumulator, EMA and
    the optimizer trace uniformly (they nest the same module names)."""
    S = mesh.shape[axis]

    def spec(path, leaf):
        s = jax.tree_util.keystr(path)
        shape = getattr(leaf, "shape", ())
        if "['stack']" in s and len(shape) >= 1 and shape[0] % S == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_pp(state, mesh: Mesh, axis: str = "pipe"):
    """Place a TrainState onto a pipeline mesh: stacked layer params
    sharded over `axis`, everything else replicated. Works under
    multi-host jax.distributed via put_tree (mesh.py)."""
    from .mesh import put_tree
    return put_tree(pp_state_shardings(state, mesh, axis), state)
