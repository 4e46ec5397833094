#!/usr/bin/env python3
"""Microbench: fused BN-apply+ReLU+matmul+stats kernel vs the XLA chain, on
the DeepLabV3+ bottleneck 1x1 shapes at 513^2 bs32 (the bench config).

Also the Mosaic-compile proof for ops/pallas/fused_matmul_bn.py — interpret
mode passing does not imply the TPU lowering compiles (CLAUDE.md).

Sync rule: this runtime's block_until_ready can return early; every timing
reads a scalar that depends on the full chain (float(...)).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_segmentation_tpu.ops.pallas.fused_matmul_bn import (
    bn_act_matmul_reference, fused_bn_act_matmul)

# (label, N, K, M) — DLV3+ bottleneck 1x1s @ 513^2 bs32
SHAPES = [
    ("layer1 conv1", 32 * 129 * 129, 256, 64),
    ("layer1 conv3", 32 * 129 * 129, 64, 256),
    ("layer2 conv3", 32 * 65 * 65, 128, 512),
    ("layer3 conv3", 32 * 33 * 33, 256, 1024),
    ("layer4 conv1", 32 * 33 * 33, 2048, 512),
    ("layer4 conv3", 32 * 33 * 33, 512, 2048),
]


def timed(fn, x, scale, shift, w, reps=30):
    """One dispatch, `reps` serialized executions inside a lax.scan (the
    tunnel costs ~33 ms per host sync — per-call timing measures only that).
    The loop-carried scalar feeds `scale`, serializing iterations without
    adding a full-tensor pass."""

    @jax.jit
    def many(x, scale, shift, w):
        def body(c, _):
            out = fn(x, scale + c, shift, w)
            leaves = jax.tree.leaves(out)
            return jnp.sum(leaves[-1]).astype(jnp.float32) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=reps)
        return c

    _ = float(many(x, scale, shift, w))  # compile + warm
    t0 = time.perf_counter()
    _ = float(many(x, scale, shift, w))
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    key = jax.random.PRNGKey(0)
    total_xla_f = total_fused_f = total_xla_b = total_fused_b = 0.0
    for label, n, k, m in SHAPES:
        kx, kw = jax.random.split(jax.random.fold_in(key, n + k))
        x = jax.random.normal(kx, (n, k), jnp.bfloat16)
        w = jax.random.normal(kw, (k, m), jnp.bfloat16) * 0.05
        scale = jnp.ones(k, jnp.float32)
        shift = jnp.zeros(k, jnp.float32)

        xla_f = timed(bn_act_matmul_reference, x, scale, shift, w)
        fused_f = timed(fused_bn_act_matmul, x, scale, shift, w)

        def make_loss(fn):
            # sum(y^2): a NON-constant output cotangent — with sum(y), XLA
            # folds dy=1 into closed forms and the comparison is bogus
            def loss(x, scale, shift, w):
                y, s, ss = fn(x, scale, shift, w)
                return (jnp.sum(jnp.square(y.astype(jnp.float32)))
                        + jnp.sum(s) * 1e-3 + jnp.sum(ss) * 1e-6)
            return jax.grad(loss, argnums=(0, 1, 2, 3))

        xla_b = timed(make_loss(bn_act_matmul_reference), x, scale, shift, w)
        fused_b = timed(make_loss(fused_bn_act_matmul), x, scale, shift, w)

        print(f"{label:14s} N={n:8d} K={k:5d} M={m:5d} | "
              f"fwd XLA {xla_f:7.2f} ms  fused {fused_f:7.2f} ms "
              f"({xla_f / fused_f:4.2f}x) | "
              f"fwd+bwd XLA {xla_b:7.2f} ms  fused {fused_b:7.2f} ms "
              f"({xla_b / fused_b:4.2f}x)", flush=True)
        total_xla_f += xla_f
        total_fused_f += fused_f
        total_xla_b += xla_b
        total_fused_b += fused_b
    print(f"{'TOTAL':14s} fwd {total_xla_f:7.2f} -> {total_fused_f:7.2f} ms "
          f"({total_xla_f / total_fused_f:4.2f}x) | fwd+bwd "
          f"{total_xla_b:7.2f} -> {total_fused_b:7.2f} ms "
          f"({total_xla_b / total_fused_b:4.2f}x)")


if __name__ == "__main__":
    main()
