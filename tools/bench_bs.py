#!/usr/bin/env python3
"""Batch-size A/B for the DLV3+ train step @513^2.

PERF.md round 3 established that the small-channel backbone layers sit on
a per-op shape floor almost independent of batch (bs8 == bs32; bs64 = 2x
work for ~1.2x time on layer1) — so a bigger batch should amortize the
floor and raise img/s/chip. This measures the FULL train step at several
batch sizes, interleaved in one process (the chip is time-shared; never
compare across processes — PERF.md protocol).

Usage: python tools/bench_bs.py [model] [bs ...]   (default deeplabv3plus
32 48 64)
"""

import sys
import time

import jax
import jax.numpy as jnp
import optax

from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import MODEL_REGISTRY
from pytorch_segmentation_tpu.ops.loss import make_loss_fn
from pytorch_segmentation_tpu.utils.runtime import setup_runtime


def main():
    setup_runtime()
    on_tpu = jax.devices()[0].platform == "tpu"
    name = sys.argv[1] if len(sys.argv) > 1 else "deeplabv3plus"
    batch_sizes = [int(a) for a in sys.argv[2:]] or [32, 48, 64]
    img = 513 if on_tpu else 65

    model = MODEL_REGISTRY[name](num_classes=21, dtype=jnp.bfloat16,
                                 full_res_output=not on_tpu)
    align = getattr(model, "up_align_corners", True)
    step = make_train_step(loss_fn=make_loss_fn(align_corners=align,
                                                use_pallas=on_tpu),
                           accumulate=1)

    variants = {}
    for bs in batch_sizes:
        images = jax.random.normal(jax.random.PRNGKey(bs),
                                   (bs, img, img, 3), jnp.float32)
        segs = jnp.zeros((bs, img, img), jnp.int32)
        # independent state per variant: step() DONATES state (PERF.md)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3), jnp.float32),
                                   optax.sgd(1e-3, momentum=0.9))
        variants[bs] = [state, images, segs]
        print(f"compiling bs{bs} ...", flush=True)
        s, loss = step(state, images, segs)
        variants[bs][0] = s
        print(f"  bs{bs} first loss {float(loss):.4f}", flush=True)

    reps = 6
    best = {bs: float("inf") for bs in batch_sizes}
    for rnd in range(4):
        for bs in batch_sizes:
            s, images, segs = variants[bs]
            s, loss = step(s, images, segs)  # re-warm after context switch
            t0 = time.perf_counter()
            for _ in range(reps):
                s, loss = step(s, images, segs)
            float(loss)  # host read = real sync on the axon runtime
            dt = (time.perf_counter() - t0) / reps
            variants[bs][0] = s
            best[bs] = min(best[bs], dt)
            print(f"round {rnd} bs{bs:3d}: {dt * 1e3:7.2f} ms/step "
                  f"{bs / dt:7.1f} img/s", flush=True)

    base = batch_sizes[0]
    print("\n== best-of-4 windows ==")
    for bs in batch_sizes:
        print(f"bs{bs:3d}: {best[bs] * 1e3:7.2f} ms/step "
              f"{bs / best[bs]:7.1f} img/s  "
              f"({(bs / best[bs]) / (base / best[base]):.3f}x vs bs{base})",
              flush=True)


if __name__ == "__main__":
    main()
