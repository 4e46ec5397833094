#!/usr/bin/env python3
"""COCO-81 extended-class kernel validation + A/B on the real chip.

Validates the 65..128-class fused kernel pair (lse-residual forward +
class-blocked backward, ops/pallas/softmax_ce.py) at the COCO-semantic
class count (81 = 80 categories + background) and measures, interleaved
in one process (the chip is time-shared — CLAUDE.md):

  mode=loss  loss fwd+bwd program: fused vs XLA fallback, plus
             eval-confusion / upsample-argmax checks incl. the borderline
             81@256^2 forward shape
  mode=step  FULL DeepLabV3+ train step (fwd+bwd+SGD) at 513^2 bf16:
             fused loss vs XLA-fallback loss, bs16 A/B + fused bs32 rate

Round-3 measured results are recorded in PERF.md ("fused kernels extended
to 65..128 classes"): loss program 3.56x, full train step 2.02x (bs16),
fused bs32 202.1 img/s.
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


def bench_loss():
    from pytorch_segmentation_tpu.ops.pallas.eval_confusion import (
        fused_eval_confusion)
    from pytorch_segmentation_tpu.ops.pallas.softmax_ce import (
        fused_upsample_ce, upsample_ce_reference)
    from pytorch_segmentation_tpu.ops.pallas.upsample_argmax import (
        fused_upsample_argmax)

    C, b, hh, H = 81, 8, 129, 513
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (b, hh, hh, C), jnp.bfloat16)
    labels = jax.random.randint(key, (b, H, H), 0, C, jnp.int32)

    opts = tpu_compiler_options()
    fused = jit_with_options(lambda l, y: jax.value_and_grad(
        lambda l2: fused_upsample_ce(l2, y))(l), compiler_options=opts)
    ref = jit_with_options(lambda l, y: jax.value_and_grad(
        lambda l2: upsample_ce_reference(l2, y))(l), compiler_options=opts)

    fv, fg = fused(logits, labels)
    rv, rg = ref(logits, labels)
    print("loss fused/ref:", float(fv), float(rv), flush=True)
    assert abs(float(fv) - float(rv)) < 2e-3, (float(fv), float(rv))
    gerr = float(jnp.max(jnp.abs(fg.astype(jnp.float32)
                                 - rg.astype(jnp.float32))))
    print("max grad abs err:", gerr, flush=True)

    ev = jit_with_options(lambda l, y: fused_eval_confusion(l, y, b),
                          compiler_options=opts)
    tp, fn, fp = ev(logits, labels)
    assert float(jnp.sum(tp) + jnp.sum(fn)) == b * H * H, "confusion counts"
    am = jit_with_options(lambda l: fused_upsample_argmax(l, (H, H)),
                          compiler_options=opts)
    masks = am(logits)
    print("argmax mask ok:", masks.shape, int(masks[0, 0, 0]), flush=True)

    # borderline forward-only shape: 81 classes @ 256^2 logits
    lg2 = jax.random.normal(key, (2, 256, 256, C), jnp.bfloat16)
    am2 = jit_with_options(lambda l: fused_upsample_argmax(l, (512, 512)),
                           compiler_options=opts)
    m2 = am2(lg2)
    print("borderline 81@256^2 argmax ok:", m2.shape, flush=True)

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
        A.append(window(ref, logits))
        B.append(window(fused, logits))
        print(f"round {r}: xla {A[-1]:.1f} ms  fused {B[-1]:.1f} ms",
              flush=True)
    ma, mb = statistics.median(A), statistics.median(B)
    print(f"medians: xla {ma:.1f} fused {mb:.1f}  speedup {ma/mb:.2f}x")


def bench_step():
    from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                       make_train_step)
    from pytorch_segmentation_tpu.models import DeepLabV3Plus
    from pytorch_segmentation_tpu.ops.loss import make_loss_fn

    img, C = 513, 81
    model = DeepLabV3Plus(num_classes=C, dtype=jnp.bfloat16,
                          full_res_output=False)
    tx = optax.sgd(1e-3, momentum=0.9)

    def make(bs, use_pallas):
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3), jnp.float32),
                                   tx)
        step = make_train_step(loss_fn=make_loss_fn(align_corners=True,
                                                    use_pallas=use_pallas),
                               accumulate=1)
        images = jax.random.normal(jax.random.PRNGKey(1),
                                   (bs, img, img, 3), jnp.float32)
        segs = jnp.zeros((bs, img, img), jnp.int32)
        return state, step, images, segs

    def window(step, s, images, segs, n=6):
        t0 = time.perf_counter()
        for _ in range(n):
            s, loss = step(s, images, segs)
        float(loss)
        return s, (time.perf_counter() - t0) / n

    bs = 16
    sF, stepF, im, sg = make(bs, True)
    sX, stepX, _, _ = make(bs, False)
    for _ in range(2):
        sF, lF = stepF(sF, im, sg)
        sX, lX = stepX(sX, im, sg)
    print("loss fused/xla:", float(lF), float(lX), flush=True)
    A, B = [], []
    for r in range(4):
        sX, tx_ = window(stepX, sX, im, sg)
        sF, tf_ = window(stepF, sF, im, sg)
        A.append(tx_)
        B.append(tf_)
        print(f"round {r}: xla {bs/tx_:.1f} img/s  fused {bs/tf_:.1f} img/s",
              flush=True)
    ma, mb = statistics.median(A), statistics.median(B)
    print(f"bs16 medians: xla {bs/ma:.1f} fused {bs/mb:.1f} img/s  "
          f"speedup {ma/mb:.2f}x", flush=True)

    s32, step32, im32, sg32 = make(32, True)
    for _ in range(2):
        s32, l32 = step32(s32, im32, sg32)
    float(l32)
    best = float("inf")
    for _ in range(4):
        s32, t = window(step32, s32, im32, sg32)
        best = min(best, t)
    print(f"bs32 fused: {32/best:.1f} img/s (best window)")


if __name__ == "__main__":
    setup_runtime()
    assert jax.devices()[0].platform == "tpu", "run on the TPU"
    mode = sys.argv[1] if len(sys.argv) > 1 else "loss"
    (bench_step if mode == "step" else bench_loss)()
