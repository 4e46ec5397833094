#!/usr/bin/env python3
"""Interleaved A/B of the SegFormer block-stage formulation on the full
train step (b2 @512^2 bf16 — the shallowest variant with real stage
depths (3,4,6,3), so the scan body executes 6 iterations in stage 3):

  A: unrolled blocks (block{i}_{j} modules, depth copies of the HLO)
  B: --scan-blocks  (stacked params, one lax.scan body per stage)

scan_blocks exists for compile time (~depth-x less HLO for b3..b5) and
pipeline sharding (parallel/pp.py); this measures its RUNTIME cost —
XLA cannot fuse across the scan boundary or specialize per layer, so a
small regression is possible. Both variants share one process and
alternate rounds (the chip is time-shared — PERF.md protocol); judge by
the ratio of medians. Also reports each variant's first-compile wall
time (the compile-time win is the feature's point).

Usage: python tools/bench_scan_blocks.py [rounds=5]
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
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    bs, img, variant = (16, 512, "b2") if on_tpu else (4, 128, "tiny-d4")

    images = jax.random.normal(jax.random.PRNGKey(1), (bs, img, img, 3),
                               jnp.float32)
    segs = jnp.zeros((bs, img, img), jnp.int32)
    step = make_train_step(loss_fn=make_loss_fn(align_corners=False,
                                                use_pallas=on_tpu),
                           accumulate=1)

    variants = {}
    for key, scan in (("unrolled", False), ("scan", True)):
        model = SegFormer(num_classes=21, variant=variant,
                          dtype=jnp.bfloat16, full_res_output=not on_tpu,
                          scan_blocks=scan)
        # independent state per variant: step() DONATES state (PERF.md)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3), jnp.float32),
                                   optax.sgd(1e-3, momentum=0.9))
        print(f"compiling {key} ...", flush=True)
        t0 = time.perf_counter()
        state, loss = step(state, images, segs)
        compile_s = time.perf_counter() - t0
        print(f"  {key}: first step (compile+run) {compile_s:.1f}s, "
              f"loss {float(loss):.4f}", flush=True)
        variants[key] = [state, [], compile_s]

    reps = 8
    for rnd in range(rounds):
        for key in variants:
            s, times, _ = variants[key]
            s, loss = step(s, images, segs)  # re-warm after context switch
            t0 = time.perf_counter()
            for _ in range(reps):
                s, loss = step(s, images, segs)
            float(loss)  # host read = real sync on the axon runtime
            dt = (time.perf_counter() - t0) / reps
            variants[key][0] = s
            times.append(dt)
            print(f"round {rnd} {key:8s}: {dt * 1e3:7.2f} ms/step "
                  f"{bs / dt:7.1f} img/s", flush=True)

    med = {k: statistics.median(v[1]) for k, v in variants.items()}
    print(f"\nmedians: unrolled {med['unrolled'] * 1e3:.2f} ms "
          f"({bs / med['unrolled']:.1f} img/s)  "
          f"scan {med['scan'] * 1e3:.2f} ms "
          f"({bs / med['scan']:.1f} img/s)  "
          f"scan/unrolled step ratio "
          f"{med['scan'] / med['unrolled']:.3f}x  "
          f"compile {variants['unrolled'][2]:.0f}s -> "
          f"{variants['scan'][2]:.0f}s", flush=True)


if __name__ == "__main__":
    main()
