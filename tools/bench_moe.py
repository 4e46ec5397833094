#!/usr/bin/env python3
"""Interleaved A/B: dense SegFormer vs MoE SegFormer on the full train
step (b0 @512^2 bf16 bs16 on TPU).

  A: dense b0 (every block a MixFFN)
  B: --moe E b0 (alternate stage-3/4 FFNs are routed E-expert MLPs,
     nn/moe.py; same token FLOPs per expert hit, ~Ex the FFN params of
     the converted blocks)

Single chip: no expert parallelism — this measures the routing +
dense-dispatch overhead (the [S, E, cap] one-hot einsums) and answers
"what does sparsity cost per step when the experts DON'T need more
chips". Both variants share one process and alternate rounds (the chip
is time-shared — PERF.md protocol); judge by the ratio of medians.

Usage: python tools/bench_moe.py [experts=4] [rounds=5]
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp
import optax

from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import SegFormer
from pytorch_segmentation_tpu.ops.loss import make_loss_fn
from pytorch_segmentation_tpu.utils.runtime import setup_runtime


def main():
    setup_runtime()
    on_tpu = jax.devices()[0].platform == "tpu"
    experts = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    bs, img = (16, 512) if on_tpu else (4, 128)

    images = jax.random.normal(jax.random.PRNGKey(1), (bs, img, img, 3),
                               jnp.float32)
    segs = jnp.zeros((bs, img, img), jnp.int32)
    step = make_train_step(loss_fn=make_loss_fn(align_corners=False,
                                                use_pallas=on_tpu),
                           accumulate=1)

    variants = {}
    for key, moe in (("dense", 0), (f"moe{experts}", experts)):
        model = SegFormer(num_classes=21, dtype=jnp.bfloat16,
                          full_res_output=not on_tpu, moe_experts=moe)
        # independent state per variant: step() DONATES state (PERF.md)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3), jnp.float32),
                                   optax.sgd(1e-3, momentum=0.9))
        n_params = sum(l.size for l in jax.tree.leaves(state.params))
        print(f"compiling {key} ({n_params / 1e6:.1f}M params) ...",
              flush=True)
        state, loss = step(state, images, segs)
        print(f"  {key} first loss {float(loss):.4f}", flush=True)
        variants[key] = [state, []]

    reps = 8
    for rnd in range(rounds):
        for key in variants:
            s, times = variants[key]
            s, loss = step(s, images, segs)  # re-warm after context switch
            t0 = time.perf_counter()
            for _ in range(reps):
                s, loss = step(s, images, segs)
            float(loss)  # host read = real sync on the axon runtime
            dt = (time.perf_counter() - t0) / reps
            variants[key][0] = s
            times.append(dt)
            print(f"round {rnd} {key:6s}: {dt * 1e3:7.2f} ms/step "
                  f"{bs / dt:7.1f} img/s", flush=True)

    ks = list(variants)
    med = {k: statistics.median(v[1]) for k, v in variants.items()}
    print(f"\nmedians: {ks[0]} {med[ks[0]] * 1e3:.2f} ms "
          f"({bs / med[ks[0]]:.1f} img/s)  "
          f"{ks[1]} {med[ks[1]] * 1e3:.2f} ms "
          f"({bs / med[ks[1]]:.1f} img/s)  "
          f"moe cost {med[ks[1]] / med[ks[0]]:.3f}x dense", flush=True)


if __name__ == "__main__":
    main()
