#!/usr/bin/env python3
"""Interleaved A/B benchmark of train-step variants on the bench config
(DLV3+ 513^2 bf16 bs32).

The tunneled chip's absolute throughput drifts over hours (measured 240 ->
150 img/s on an unchanged bench.py — the device is time-shared): separate
runs are NOT comparable. Both variants are built in ONE process and timed
in alternating rounds; judge by the ratio of medians.

Usage: python tools/bench_ab.py [dot1x1|fused1x1]
"""

import os
import sys
import time

# A/B owns its compiler options explicitly (build(compiler_options=...));
# disable the engine's automatic TPU options so the baseline is clean and
# make_train_step returns a plain jit (with .lower) rather than the
# options-applying wrapper
os.environ["PSEG_XLA_OPTS"] = ""

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
_CE_TILE = None


def _set_f32_loss(on):
    global _F32_LOSS
    _F32_LOSS = on


def _set_ce_tile(tile):
    global _CE_TILE
    _CE_TILE = tile


_NOOP = lambda: None

# name -> dict(a=set_baseline, b=set_variant, opts=variant_compiler_options,
#              bs_b=variant batch size). Timing compares PER-IMAGE cost.
VARIANTS = {
    "dot1x1": dict(a=lambda: blocks.set_conv1x1_dot(False),
                   b=lambda: blocks.set_conv1x1_dot(True)),
    "fused1x1": dict(a=lambda: blocks.set_force_fused_1x1(None),
                     b=lambda: blocks.set_force_fused_1x1("on")),
    # old behavior: cast logits f32 BEFORE the CE kernel (doubles the
    # class-major transpose traffic; math identical)
    "f32loss": dict(a=lambda: _set_f32_loss(True),
                    b=lambda: _set_f32_loss(False)),
    # XLA compiler-option experiments (local jaxlib is CPU-only and rejects
    # TPU flags via XLA_FLAGS; per-compile compiler_options ship with the
    # remote compile request instead)
    "vmem32": dict(opts={"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    "vmem64": dict(opts={"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    "bs64": dict(bs_b=64),
    "bs64vmem32": dict(bs_b=64,
                       opts={"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    # fused-CE row tile 64 -> 128 (half the grid steps, taller MXU tiles)
    "cetile128": dict(b=lambda: _set_ce_tile(128)),
}


def build(on_tpu, images, segs, compiler_options=None):
    model = DeepLabV3Plus(num_classes=21, dtype=jnp.bfloat16,
                          full_res_output=not on_tpu)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               optax.sgd(1e-3, momentum=0.9))
    loss_fn = make_loss_fn(align_corners=True, use_pallas=on_tpu)
    if _F32_LOSS:
        inner = loss_fn
        loss_fn = lambda lg, tg: inner(lg.astype(jnp.float32), tg)
    if _CE_TILE is not None:
        from pytorch_segmentation_tpu.ops.pallas.softmax_ce import \
            fused_upsample_ce
        tile = _CE_TILE
        loss_fn = lambda lg, tg: fused_upsample_ce(lg, tg,
                                                   align_corners=True,
                                                   tile=tile)
    step = make_train_step(loss_fn=loss_fn, accumulate=1)
    # variant switches are read at TRACE time: compile NOW, while this
    # variant's global flags are set (lazy tracing at first call would see
    # whatever flags were set last)
    compiled = step.lower(state, images, segs).compile(
        compiler_options=compiler_options)
    return state, compiled


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "dot1x1"
    spec = VARIANTS[variant]
    set_a = spec.get("a", _NOOP)
    set_b = spec.get("b", _NOOP)
    opts_b = spec.get("opts")
    setup_runtime()
    on_tpu = jax.devices()[0].platform == "tpu"
    img = 513 if on_tpu else 129
    bs_a = 32 if on_tpu else 4
    bs_b = spec.get("bs_b", bs_a) if on_tpu else bs_a

    def data(bs):
        return (jax.random.normal(jax.random.PRNGKey(1),
                                  (bs, img, img, 3), jnp.float32),
                jnp.zeros((bs, img, img), jnp.int32))

    imgs_a, segs_a = data(bs_a)
    imgs_b, segs_b = data(bs_b) if bs_b != bs_a else (imgs_a, segs_a)

    set_a()
    state_a, step_a = build(on_tpu, imgs_a, segs_a)
    set_b()
    state_b, step_b = build(on_tpu, imgs_b, segs_b,
                            compiler_options=opts_b)

    def warm(step, state, imgs, segs):
        s = state
        for _ in range(3):
            s, loss = step(s, imgs, segs)
        print("loss@3", float(loss), flush=True)
        return s

    sa = warm(step_a, state_a, imgs_a, segs_a)
    sb = warm(step_b, state_b, imgs_b, segs_b)

    def round_time(step, s, imgs, segs, reps=8):
        t0 = time.perf_counter()
        for _ in range(reps):
            s, loss = step(s, imgs, segs)
        float(loss)
        return (time.perf_counter() - t0) / reps, s

    ta, tb = [], []
    for r in range(5):
        dt, sa = round_time(step_a, sa, imgs_a, segs_a)
        ta.append(dt / bs_a)  # per-image
        dt, sb = round_time(step_b, sb, imgs_b, segs_b)
        tb.append(dt / bs_b)
        print(f"round {r}: base {ta[-1] * 1e3:7.3f} ms/img  "
              f"{variant} {tb[-1] * 1e3:7.3f} ms/img  "
              f"ratio {ta[-1] / tb[-1]:.3f}", flush=True)
    med = lambda v: sorted(v)[len(v) // 2]
    print(f"median: base {med(ta) * 1e3:.3f} ms/img, "
          f"{variant} {med(tb) * 1e3:.3f} ms/img, "
          f"speedup {med(ta) / med(tb):.3f}x", flush=True)


if __name__ == "__main__":
    main()
