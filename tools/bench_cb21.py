#!/usr/bin/env python3
"""cb-vs-auto CE-backward A/B at VOC-21 on the real chip.

The <=64-class fused CE backward recomputes the online softmax over ALL
classes from the saved logits (`_bwd_kernel`). The 65..128-class extension
added a class-blocked backward (`_bwd_cb_kernel`) driven by an lse residual
written by the forward; `set_ce_bwd_mode('cb')` forces that pair at any
class count (trace-time knob). This tool answers the round-3 open thread:
does the class-blocked pair also win at VOC-21 (C=21), where the all-class
recompute is the measured-good default?

Trade: 'cb' writes a [B, H_out/4-ish, W] f32 lse residual in the forward
(extra HBM traffic) but the backward streams only cb=7 classes at a time
(less VMEM pressure, no [C, tile, W] scratch). At C=21 the all-class
working set is small anyway, so the prior expectation is ~parity.

Interleaved in one process (the chip is time-shared — CLAUDE.md):
  mode=loss  loss fwd+bwd program only (isolates the kernel pair)
  mode=step  FULL DeepLabV3+ train step at 513^2 bf16 bs32 (the headline
             config) — the number that decides the default

Decision rule (CLAUDE.md round-3 open threads): flip the <=64 default to
'cb' iff the full-step speedup >= ~1.02x.
"""
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import optax

from pytorch_segmentation_tpu.utils.runtime import (jit_with_options,
                                                    setup_runtime,
                                                    tpu_compiler_options)


def _trace_pair(build):
    """Trace one program per backward mode; each jitted program keeps the
    kernel pair that was active at trace time."""
    from pytorch_segmentation_tpu.ops.pallas.softmax_ce import set_ce_bwd_mode
    out = {}
    for mode in ("auto", "cb"):
        set_ce_bwd_mode(mode)
        out[mode] = build()
    set_ce_bwd_mode("auto")
    return out


def bench_loss():
    from pytorch_segmentation_tpu.ops.pallas.softmax_ce import (
        fused_upsample_ce)

    C, b, hh, H = 21, 32, 129, 513
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (b, hh, hh, C), jnp.bfloat16)
    labels = jax.random.randint(key, (b, H, H), 0, C, jnp.int32)

    opts = tpu_compiler_options()
    fns = _trace_pair(lambda: jit_with_options(
        lambda l, y: jax.value_and_grad(
            lambda l2: fused_upsample_ce(l2, y))(l), compiler_options=opts))

    va, ga = fns["auto"](logits, labels)
    vb, gb = fns["cb"](logits, labels)
    print("loss auto/cb:", float(va), float(vb), flush=True)
    assert abs(float(va) - float(vb)) < 2e-3, (float(va), float(vb))
    gerr = float(jnp.max(jnp.abs(ga.astype(jnp.float32)
                                 - gb.astype(jnp.float32))))
    print("max grad abs err:", gerr, flush=True)

    def window(fn, l):
        v, g = fn(l, labels)
        float(v)
        t0 = time.perf_counter()
        for _ in range(6):
            v, g = fn(l + g.astype(l.dtype) * 0, labels)
        float(v)
        return (time.perf_counter() - t0) / 6 * 1e3

    A, B = [], []
    for r in range(4):
        A.append(window(fns["auto"], logits))
        B.append(window(fns["cb"], logits))
        print(f"round {r}: auto {A[-1]:.2f} ms  cb {B[-1]:.2f} ms",
              flush=True)
    ma, mb = statistics.median(A), statistics.median(B)
    print(f"medians: auto {ma:.2f} cb {mb:.2f}  cb speedup {ma/mb:.3f}x")


def bench_step():
    from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                       make_train_step)
    from pytorch_segmentation_tpu.models import DeepLabV3Plus
    from pytorch_segmentation_tpu.ops.loss import make_loss_fn

    img, C, bs = 513, 21, 32
    model = DeepLabV3Plus(num_classes=C, dtype=jnp.bfloat16,
                          full_res_output=False)
    tx = optax.sgd(1e-3, momentum=0.9)

    def make():
        # the train step DONATES state — each mode owns its own state
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3), jnp.float32),
                                   tx)
        step = make_train_step(loss_fn=make_loss_fn(align_corners=True,
                                                    use_pallas=True),
                               accumulate=1)
        return [state, step]

    pair = _trace_pair(make)
    images = jax.random.normal(jax.random.PRNGKey(1),
                               (bs, img, img, 3), jnp.float32)
    segs = jnp.zeros((bs, img, img), jnp.int32)

    losses = {}
    for mode, (s, step) in pair.items():
        for _ in range(2):
            s, loss = step(s, images, segs)
        pair[mode][0] = s
        losses[mode] = float(loss)
    print("loss auto/cb:", losses["auto"], losses["cb"], flush=True)

    def window(mode, n=6):
        s, step = pair[mode]
        t0 = time.perf_counter()
        for _ in range(n):
            s, loss = step(s, images, segs)
        float(loss)
        pair[mode][0] = s
        return (time.perf_counter() - t0) / n

    A, B = [], []
    for r in range(4):
        A.append(window("auto"))
        B.append(window("cb"))
        print(f"round {r}: auto {bs/A[-1]:.1f} img/s  cb {bs/B[-1]:.1f} "
              f"img/s", flush=True)
    ma, mb = statistics.median(A), statistics.median(B)
    print(f"bs{bs} medians: auto {bs/ma:.1f} cb {bs/mb:.1f} img/s  "
          f"cb speedup {ma/mb:.3f}x", flush=True)


if __name__ == "__main__":
    setup_runtime()
    assert jax.devices()[0].platform == "tpu", "run on the TPU"
    mode = sys.argv[1] if len(sys.argv) > 1 else "step"
    (bench_step if mode == "step" else bench_loss)()
