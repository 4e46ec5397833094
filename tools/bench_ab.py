#!/usr/bin/env python3
"""Interleaved A/B benchmark of train-step variants on the bench config
(DLV3+ 513^2 bf16 bs32).

The tunneled chip's absolute throughput drifts over hours (measured 240 ->
150 img/s on an unchanged bench.py — the device is time-shared): separate
runs are NOT comparable. Both variants are built in ONE process and timed
in alternating rounds; judge by the ratio of medians.

Usage: python tools/bench_ab.py [dot1x1|fused1x1]
"""

import sys
import time

import jax
import jax.numpy as jnp
import optax

from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import DeepLabV3Plus
from pytorch_segmentation_tpu.nn import blocks
from pytorch_segmentation_tpu.ops.loss import make_loss_fn
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

_F32_LOSS = False


def _set_f32_loss(on):
    global _F32_LOSS
    _F32_LOSS = on


VARIANTS = {
    # name -> (set_baseline, set_variant)
    "dot1x1": (lambda: blocks.set_conv1x1_dot(False),
               lambda: blocks.set_conv1x1_dot(True)),
    "fused1x1": (lambda: blocks.set_force_fused_1x1(None),
                 lambda: blocks.set_force_fused_1x1("on")),
    # old behavior: cast logits f32 BEFORE the CE kernel (doubles the
    # class-major transpose traffic; math identical)
    "f32loss": (lambda: _set_f32_loss(True),
                lambda: _set_f32_loss(False)),
}


def build(on_tpu, images, segs):
    model = DeepLabV3Plus(num_classes=21, dtype=jnp.bfloat16,
                          full_res_output=not on_tpu)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               optax.sgd(1e-3, momentum=0.9))
    loss_fn = make_loss_fn(align_corners=True, use_pallas=on_tpu)
    if _F32_LOSS:
        inner = loss_fn
        loss_fn = lambda lg, tg: inner(lg.astype(jnp.float32), tg)
    step = make_train_step(loss_fn=loss_fn, accumulate=1)
    # variant switches are read at TRACE time: compile NOW, while this
    # variant's global flags are set (lazy tracing at first call would see
    # whatever flags were set last)
    compiled = step.lower(state, images, segs).compile()
    return state, compiled


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "dot1x1"
    set_a, set_b = VARIANTS[variant]
    setup_runtime()
    on_tpu = jax.devices()[0].platform == "tpu"
    img = 513 if on_tpu else 129
    bs = 32 if on_tpu else 4
    images = jax.random.normal(jax.random.PRNGKey(1), (bs, img, img, 3),
                               jnp.float32)
    segs = jnp.zeros((bs, img, img), jnp.int32)

    set_a()
    state_a, step_a = build(on_tpu, images, segs)
    set_b()
    state_b, step_b = build(on_tpu, images, segs)

    def warm(step, state):
        s = state
        for _ in range(3):
            s, loss = step(s, images, segs)
        print("loss@3", float(loss), flush=True)
        return s

    sa = warm(step_a, state_a)
    sb = warm(step_b, state_b)

    def round_time(step, s, reps=8):
        t0 = time.perf_counter()
        for _ in range(reps):
            s, loss = step(s, images, segs)
        float(loss)
        return (time.perf_counter() - t0) / reps, s

    ta, tb = [], []
    for r in range(5):
        dt, sa = round_time(step_a, sa)
        ta.append(dt)
        dt, sb = round_time(step_b, sb)
        tb.append(dt)
        print(f"round {r}: base {ta[-1] * 1e3:7.2f} ms  "
              f"{variant} {tb[-1] * 1e3:7.2f} ms  "
              f"ratio {ta[-1] / tb[-1]:.3f}", flush=True)
    med = lambda v: sorted(v)[len(v) // 2]
    print(f"median: base {med(ta) * 1e3:.2f} ms, "
          f"{variant} {med(tb) * 1e3:.2f} ms, "
          f"speedup {med(ta) / med(tb):.3f}x", flush=True)


if __name__ == "__main__":
    main()
