"""Tensor parallelism (Megatron-style) for the transformer family.

The reference's only distribution strategy is DDP data parallelism
(reference train.py:108-123); this module is a TPU-native scaling axis
BEYOND it: intra-layer model parallelism over a mesh `'model'` axis,
expressed purely as *parameter shardings* — XLA's SPMD partitioner
(GSPMD) propagates them through the program and inserts the collectives
(the classic Megatron-LM pattern, Shoeybi et al. 2019, realized the JAX
way: annotate shardings, let the compiler place the all-reduces on ICI).

Mapping for SegFormer (models/segformer.py) blocks:

  column-parallel (output features sharded, no comms on entry):
      attn/q/kernel, attn/kv/kernel, ffn/fc1/kernel    P(None, 'model')
      (+ their biases P('model'))
  sharded elementwise interior:
      attention heads / head-dim and the MixFFN hidden channels stay
      sharded through reshape/transpose/einsum/GELU; the 3x3 depthwise
      dwconv partitions on its feature axis  P(None, None, None, 'model')
  row-parallel (input features sharded -> partial sums -> one
  all-reduce per block half):
      attn/proj/kernel, ffn/fc2/kernel                 P('model', None)
  everything else (patch embeds, LayerNorms, sr conv, decoder, cls):
      replicated P()

Head-count note: stages whose head count is not divisible by the tp
degree (SegFormer heads are (1,2,5,8)) still run CORRECTLY — GSPMD
falls back to sharding the head_dim, which turns the q@k^T contraction
into partial sums + an extra all-reduce. The FLOP-dominant MixFFN
(mlp_ratio 4) shards cleanly at any tp that divides 4*dim, which is
where the memory/throughput win lives.

The spec rule is NAME-based (on the pytree key path), so one rule tree
covers params, the f32 grad accumulator, EMA params, and the optax
momentum trace uniformly — they all nest the same module names. Leaves
whose sharded dimension is not divisible by the tp degree fall back to
replicated (correct, just not distributed).

Gradients of sharded params come out of `jax.grad` sharded the same way
(GSPMD keeps dL/dW co-located with W), so the whole TrainState shards
once up front and the unmodified train step (engine/steps.py) runs
tp x dp with zero engine changes.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_param_spec", "tp_state_shardings", "shard_tp",
           "make_tp_mesh"]

# (regex on the flax key path tail, spec, index of the sharded dim)
_RULES = (
    (re.compile(r"\['attn'\]\['(q|kv)'\]\['kernel'\]$"), ("col",), 1),
    (re.compile(r"\['ffn'\]\['fc1'\]\['kernel'\]$"), ("col",), 1),
    (re.compile(r"\['attn'\]\['(q|kv)'\]\['bias'\]$"), ("vec",), 0),
    (re.compile(r"\['ffn'\]\['(fc1|dwconv)'\]\['bias'\]$"), ("vec",), 0),
    (re.compile(r"\['attn'\]\['proj'\]\['kernel'\]$"), ("row",), 0),
    (re.compile(r"\['ffn'\]\['fc2'\]\['kernel'\]$"), ("row",), 0),
    (re.compile(r"\['ffn'\]\['dwconv'\]\['kernel'\]$"), ("dw",), 3),
    # ViT-style blocks (nn/backbones/vit.py: Segmenter/UPerNet-ViT and
    # the maskformer decoder's bare fc1/fc2/proj Denses): fused qkv and
    # fc1 column-parallel, proj/fc2 row-parallel. The 2-D shape guard in
    # tp_param_spec keeps these name rules away from conv kernels.
    (re.compile(r"\['qkv'\]\['kernel'\]$"), ("col",), 1),
    (re.compile(r"\['fc1'\]\['kernel'\]$"), ("col",), 1),
    (re.compile(r"\['(proj|fc2)'\]\['kernel'\]$"), ("row",), 0),
    (re.compile(r"\['(qkv|fc1)'\]\['bias'\]$"), ("vec",), 0),
)


def tp_param_spec(path, leaf, tp: int, axis: str = "model"):
    """PartitionSpec for one pytree leaf. `path` is a jax key path (tuple)
    or its keystr; non-matching / non-divisible leaves are replicated."""
    s = path if isinstance(path, str) else jax.tree_util.keystr(path)
    shape = getattr(leaf, "shape", ())
    for rx, (kind,), dim in _RULES:
        if rx.search(s):
            if len(shape) <= dim or shape[dim] % tp != 0:
                return P()  # indivisible -> replicated (still correct)
            # col/row apply to 2-D Dense kernels, vec to 1-D biases, dw
            # to 4-D depthwise convs — other ranks (e.g. a 4-D conv
            # named 'proj') replicate rather than mis-shard
            if kind == "col" and len(shape) == 2:
                return P(None, axis)
            if kind == "row" and len(shape) == 2:
                return P(axis, None)
            if kind == "vec" and len(shape) == 1:
                return P(axis)
            if kind == "dw" and len(shape) == 4:
                return P(None, None, None, axis)
            return P()
    return P()


def tp_state_shardings(state, mesh: Mesh, axis: str = "model"):
    """NamedSharding tree for a TrainState (params + grad accumulator +
    EMA + optimizer trace share the name-based rule; scalars/stats P())."""
    tp = mesh.shape[axis]
    return jax.tree_util.tree_map_with_path(
        lambda p, l: NamedSharding(mesh, tp_param_spec(p, l, tp, axis)),
        state)


def shard_tp(state, mesh: Mesh, axis: str = "model"):
    """Place a TrainState onto a tensor-parallel mesh: matched transformer
    weights sharded over `axis`, everything else replicated. Works under
    multi-host jax.distributed via put_tree (mesh.py)."""
    from .mesh import put_tree
    return put_tree(tp_state_shardings(state, mesh, axis), state)


def make_tp_mesh(tp: int, devices=None) -> Mesh:
    """(data, model) 2-D mesh: batch shards over 'data' (outer, DCN/ICI-
    friendly), tensor-parallel weights over the inner 'model' axis so the
    per-block all-reduces ride the fastest links."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    assert devices.size % tp == 0, (devices.size, tp)
    return Mesh(devices.reshape(devices.size // tp, tp), ("data", "model"))
