#!/usr/bin/env python3
"""In-step validation of the 81-class @ 256^2-logits train gate.

`fused_upsample_ce` gates 65..128-class TRAIN shapes on
`_VMEM_BUDGET_TRAIN` (16 MiB naive forward bytes): under remat the fused
forward kernel can be recomputed co-resident with backward kernels, and
the compiler's scoped-vmem stack accounting runs ~1.7x naive block math
(PERF.md round 3), so the train path is conservative. The 81@256^2 shape
(COCO-81 UNet at 512^2 with full_res_output=False; ~23 MB naive forward)
therefore falls back to XLA in training even though the forward-only
program is chip-validated (bench_c81 argmax).

This probe answers whether that conservatism is needed: it raises the
train budget to the forward-only budget (trace-time monkeypatch), builds
the FULL UNet train step (fwd+bwd+SGD) at 512^2 bs8 C=81, and compiles +
runs it on the real chip. Outcomes:

  - Mosaic rejects (scoped-vmem overflow at compile) -> the 16 MiB gate
    stays; record the compiler-reported bytes.
  - Compiles but slower than the XLA fallback -> gate stays (fallback is
    the right default), record the A/B.
  - Compiles and wins the interleaved A/B -> relax _VMEM_BUDGET_TRAIN.
"""
import statistics
import time

import jax
import jax.numpy as jnp
import optax

from pytorch_segmentation_tpu.utils.runtime import setup_runtime


def main():
    from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                       make_train_step)
    from pytorch_segmentation_tpu.models import UNet
    from pytorch_segmentation_tpu.ops.loss import make_loss_fn
    from pytorch_segmentation_tpu.ops.pallas import softmax_ce

    img, C, bs = 512, 81, 8
    model = UNet(num_classes=C, dtype=jnp.bfloat16, full_res_output=False)
    tx = optax.sgd(1e-3, momentum=0.9)
    images = jax.random.normal(jax.random.PRNGKey(1),
                               (bs, img, img, 3), jnp.float32)
    segs = jnp.zeros((bs, img, img), jnp.int32)

    def make(budget):
        """Build AND trace (first call) under the patched train budget —
        the gate routes at trace time, so the patch must cover the first
        step call, not just construction."""
        default = softmax_ce._VMEM_BUDGET_TRAIN
        softmax_ce._VMEM_BUDGET_TRAIN = budget
        try:
            state = create_train_state(model, jax.random.PRNGKey(0),
                                       jnp.zeros((1, 64, 64, 3),
                                                 jnp.float32), tx)
            step = make_train_step(loss_fn=make_loss_fn(align_corners=True,
                                                        use_pallas=True),
                                   accumulate=1)
            t0 = time.perf_counter()
            state, loss = step(state, images, segs)
            print("  traced+ran: loss %.5f (%.0fs)"
                  % (float(loss), time.perf_counter() - t0), flush=True)
        finally:
            softmax_ce._VMEM_BUDGET_TRAIN = default
        return [state, step]

    print("shape: C=%d logits 256^2 -> labels %d^2, bs%d" % (C, img, bs),
          flush=True)
    fits = softmax_ce.forward_kernel_fits(
        C, 256, 256, img, 2, budget=softmax_ce._VMEM_BUDGET)
    print("forward fits at the forward-only 24MiB budget:", fits, flush=True)

    pair = {}
    try:
        print("fused (budget = forward-only 24MiB):", flush=True)
        pair["fused"] = make(softmax_ce._VMEM_BUDGET)
    except Exception as e:  # Mosaic scoped-vmem overflow lands here
        print("FUSED PATH FAILED IN-STEP:", type(e).__name__, flush=True)
        print(str(e)[:2000], flush=True)
        print("verdict: keep the conservative train gate", flush=True)
        return

    print("xla fallback (budget = 0):", flush=True)
    pair["xla"] = make(0)  # budget 0 -> fused gate fails -> XLA fallback

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
        A.append(window("xla"))
        B.append(window("fused"))
        print(f"round {r}: xla {bs/A[-1]:.1f} img/s  fused {bs/B[-1]:.1f} "
              f"img/s", flush=True)
    ma, mb = statistics.median(A), statistics.median(B)
    print(f"medians: xla {bs/ma:.1f} fused {bs/mb:.1f} img/s  "
          f"fused speedup {ma/mb:.3f}x", flush=True)


if __name__ == "__main__":
    setup_runtime()
    assert jax.devices()[0].platform == "tpu", "run on the TPU"
    main()
