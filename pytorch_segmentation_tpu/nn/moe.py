"""Mixture-of-Experts FFN with static-shape token dispatch.

A capability BEYOND the reference (WoodsGao/pytorch_segmentation has no
sparse models at all): the V-MoE recipe (Riquelme et al. 2021) applied
to the zoo's transformer family — replace the FFN of selected encoder
blocks with E expert MLPs and route each token to its top-k experts.

TPU-native design (the GShard/Mesh-TensorFlow dense-dispatch
formulation, Lepikhin et al. 2020):
  - Routing is argmax top-k of a linear router — deterministic, no RNG
    (the train step is deterministic end-to-end, a house convention;
    V-MoE's optional routing noise is omitted).
  - Dispatch/combine are DENSE one-hot tensors [S, E, cap] consumed by
    two einsums — static shapes, no gather/scatter, everything rides
    the MXU, and XLA's SPMD partitioner can turn the token->expert
    reshuffle into an all-to-all when the experts are sharded over an
    'expert' mesh axis (parallel/ep.py).
  - Fixed expert capacity cap = ceil(k*S/E * capacity_factor); tokens
    over capacity are DROPPED (their combine weight is zero) and pass
    through the block's residual unchanged — the standard Switch/GShard
    overflow behavior that keeps shapes static.
  - Load balancing: the Switch Transformer auxiliary loss (Fedus et
    al. 2021, eq. 4) aux = E * sum_e f_e * P_e, sown into the
    "moe_losses" collection; the train step adds every sown value to
    the total loss (engine/steps.py), already scaled by aux_weight.

The expert is a plain 2-layer GELU MLP (per V-MoE). SegFormer's MixFFN
carries a 3x3 depthwise conv for positional information; in a MoE
block that conv is omitted (token dispatch destroys the spatial grid)
— the surrounding dense blocks keep theirs, which preserves the
positional signal (MoE replaces only every second block's FFN by
default, models/segformer.py moe_experts).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MoEMlp"]


class _ExpertMlp(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        y = jax.nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="fc2")(y)


class MoEMlp(nn.Module):
    """[B, H, W, C] -> [B, H, W, C] mixture-of-experts MLP.

    Routing/combine math runs in f32 (router probabilities and the
    combine weights are small tensors; precision matters for the
    load-balance gradient); expert matmuls run in `dtype` like every
    other MXU op. The auxiliary load-balance loss is sown PRE-WEIGHTED
    (aux_weight * E * sum f*P) into "moe_losses" — a no-op unless the
    caller marks that collection mutable (the train step does; eval
    doesn't)."""

    dim: int
    hidden: int
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25
    aux_weight: float = 0.01
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        s = b * h * w
        e = self.num_experts
        k = min(self.top_k, e)
        cap = max(1, int(math.ceil(k * s / e * self.capacity_factor)))
        cap = min(cap, s)
        xt = x.reshape(s, c)

        router = nn.Dense(e, dtype=jnp.float32, param_dtype=jnp.float32,
                          name="router")(xt.astype(jnp.float32))
        probs = jax.nn.softmax(router, axis=-1)            # [S, E] f32
        gates, idx = jax.lax.top_k(probs, k)               # [S, k]
        # GShard-normalized combine weights over the chosen experts
        gates = gates / jnp.maximum(
            jnp.sum(gates, axis=-1, keepdims=True), 1e-9)

        # position-in-expert: rank-r choices are placed after all rank<r
        # assignments (the standard priority order — a token's 2nd choice
        # never evicts another token's 1st)
        counts = jnp.zeros((e,), jnp.int32)
        dispatch = jnp.zeros((s, e, cap), jnp.float32)
        combine = jnp.zeros((s, e, cap), jnp.float32)
        for r in range(k):
            onehot = jax.nn.one_hot(idx[:, r], e, dtype=jnp.int32)
            pos = jnp.cumsum(onehot, axis=0) - onehot + counts  # [S, E]
            pos_r = jnp.sum(pos * onehot, axis=1)               # [S]
            counts = counts + jnp.sum(onehot, axis=0)
            keep = (pos_r < cap).astype(jnp.float32)
            slot = jax.nn.one_hot(jnp.minimum(pos_r, cap - 1), cap)
            d_r = (onehot.astype(jnp.float32)[:, :, None]
                   * slot[:, None, :] * keep[:, None, None])
            dispatch = dispatch + d_r
            combine = combine + d_r * gates[:, r][:, None, None]

        # token -> expert shuffle, expert MLPs, expert -> token shuffle
        expert_in = jnp.einsum("sec,sm->ecm", dispatch.astype(self.dtype),
                               xt.astype(self.dtype))       # [E, cap, C]
        experts = nn.vmap(_ExpertMlp, in_axes=0, out_axes=0,
                          variable_axes={"params": 0},
                          split_rngs={"params": True})(
            self.dim, self.hidden, self.dtype, name="experts")
        expert_out = experts(expert_in)                     # [E, cap, C]
        y = jnp.einsum("ecm,sec->sm", expert_out.astype(jnp.float32),
                       combine)                             # [S, C] f32

        # Switch load-balance loss: fraction of tokens whose FIRST choice
        # is e, times the mean router probability of e
        f = jnp.mean(jax.nn.one_hot(idx[:, 0], e, dtype=jnp.float32),
                     axis=0)
        p = jnp.mean(probs, axis=0)
        self.sow("moe_losses", "aux",
                 self.aux_weight * e * jnp.sum(f * p),
                 reduce_fn=lambda a, b: a + b, init_fn=lambda: 0.0)
        return y.reshape(b, h, w, c).astype(x.dtype)
