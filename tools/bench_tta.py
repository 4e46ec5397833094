#!/usr/bin/env python3
"""TTA cost on the full fused eval step (DLV3+ 21-class, 513^2 bf16).

Variants (each its own jitted program, all fused-Pallas eval paths):
  base           single forward
  flip           --tta             (2 forwards)
  flip+ms        --tta --tta-scales 0.75 1.25
                 (6 forwards: {1.0, 0.75, 1.25} x {id, flip}; the scaled
                  forwards run at 384^2 / 640^2 — cost ~ sum of scale^2)

Drift-proof protocol (CLAUDE.md): all variants in one process, alternating
rounds, medians. Sync via host read (block_until_ready unreliable on the
tunneled runtime). Usage: python tools/bench_tta.py [rounds] [batch]
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp
import optax

from pytorch_segmentation_tpu.engine.steps import (TrainState,
                                                   create_train_state,
                                                   make_eval_step)
from pytorch_segmentation_tpu.models import DeepLabV3Plus
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

IMG = 513


def main(rounds: int, b: int):
    model = DeepLabV3Plus(num_classes=21, dtype=jnp.bfloat16,
                          full_res_output=False)
    tstate = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.zeros((1, IMG, IMG, 3), jnp.float32),
                                optax.sgd(1e-3))
    state = TrainState(step=0, params=tstate.params,
                       batch_stats=tstate.batch_stats, opt_state=None,
                       tx=None, apply_fn=model.apply)
    images = jax.random.normal(jax.random.PRNGKey(1), (b, IMG, IMG, 3),
                               jnp.float32)
    segs = jax.random.randint(jax.random.PRNGKey(2), (b, IMG, IMG), 0, 21,
                              jnp.int32)
    valid = jnp.array(b)

    variants = {
        "base": make_eval_step(21),
        "flip": make_eval_step(21, tta_flip=True),
        "flip+ms": make_eval_step(21, tta_flip=True,
                                  tta_scales=(0.75, 1.25)),
    }

    def window(step, reps=4):
        loss, *_ = step(state, images, segs, valid)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(reps):
            loss, *_ = step(state, images, segs, valid)
        float(loss)
        return (time.perf_counter() - t0) / reps

    times = {k: [] for k in variants}
    for r in range(rounds):
        msg = [f"round {r}:"]
        for k, step in variants.items():
            dt = window(step)
            times[k].append(dt)
            msg.append(f"{k} {b / dt:6.1f} img/s")
        print("   ".join(msg), flush=True)
    med = {k: statistics.median(v) for k, v in times.items()}
    base = med["base"]
    print("medians: " + "  ".join(
        f"{k} {b / v:.1f} img/s ({base / v:.2f}x base cost)"
        for k, v in med.items()))


if __name__ == "__main__":
    setup_runtime()
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         int(sys.argv[2]) if len(sys.argv) > 2 else 16)
