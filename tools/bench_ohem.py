#!/usr/bin/env python3
"""Interleaved A/B: the CE-knob cost on the full DLV3+ train step
(@513^2 bf16 bs16 on TPU).

  A: default fused path — deferred upsample + Pallas upsample+CE
  B: plain CE on full-res logits (what ANY custom loss costs: the
     Trainer disables the deferred upsample for non-default losses)
  C: OHEM CE (build_loss ohem_frac) on full-res logits — B plus the
     per-pixel top_k over S = B*H*W losses

C/B isolates the OHEM top_k itself; B/A is the known custom-loss-path
cost. Protocol: one process, alternating rounds, medians (PERF.md).

Usage: python tools/bench_ohem.py [rounds=5] [ohem_frac=0.1]
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp
import optax

from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import DeepLabV3Plus
from pytorch_segmentation_tpu.ops.loss import (build_loss, compute_loss,
                                               make_loss_fn)
from pytorch_segmentation_tpu.utils.runtime import setup_runtime


def main():
    setup_runtime()
    on_tpu = jax.devices()[0].platform == "tpu"
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    bs, img = (16, 513) if on_tpu else (4, 129)

    images = jax.random.normal(jax.random.PRNGKey(1), (bs, img, img, 3),
                               jnp.float32)
    segs = jnp.zeros((bs, img, img), jnp.int32)

    losses = {
        "fused": (make_loss_fn(use_pallas=on_tpu), False),
        "fullres": (compute_loss, True),
        "ohem": (build_loss("ce", ohem_frac=frac), True),
    }
    variants = {}
    for key, (loss_fn, full_res) in losses.items():
        model = DeepLabV3Plus(num_classes=21, dtype=jnp.bfloat16,
                              full_res_output=full_res)
        step = make_train_step(loss_fn=loss_fn, accumulate=1)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 65, 65, 3), jnp.float32),
                                   optax.sgd(1e-3, momentum=0.9))
        print(f"compiling {key} ...", flush=True)
        state, loss = step(state, images, segs)
        print(f"  {key} first loss {float(loss):.4f}", flush=True)
        variants[key] = [state, step, []]

    reps = 8
    for rnd in range(rounds):
        for key in variants:
            s, step, times = variants[key]
            s, loss = step(s, images, segs)
            t0 = time.perf_counter()
            for _ in range(reps):
                s, loss = step(s, images, segs)
            float(loss)  # host read = real sync on the axon runtime
            dt = (time.perf_counter() - t0) / reps
            variants[key][0] = s
            times.append(dt)
            print(f"round {rnd} {key:8s}: {dt * 1e3:7.2f} ms/step "
                  f"{bs / dt:7.1f} img/s", flush=True)

    med = {k: statistics.median(v[2]) for k, v in variants.items()}
    f, fr, oh = med["fused"], med["fullres"], med["ohem"]
    print(f"\nmedians: fused {f*1e3:.2f} ms ({bs/f:.1f} img/s)  "
          f"fullres {fr*1e3:.2f} ms ({bs/fr:.1f})  "
          f"ohem {oh*1e3:.2f} ms ({bs/oh:.1f})", flush=True)
    print(f"custom-loss path cost (fullres/fused): {fr/f:.3f}x  "
          f"ohem top_k on top (ohem/fullres): {oh/fr:.3f}x", flush=True)


if __name__ == "__main__":
    main()
