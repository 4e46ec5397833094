#!/usr/bin/env python3
"""Sweep the int8 per-layer gate threshold (nn.blocks._QUANT_MIN_K).

Un-gated int8 PTQ is a big LOSS on UNet (0.60x) and a small loss on HRNet
(0.96x) while winning 1.24x on DLV3+ — the floor-/bandwidth-bound convs
(short contraction K = kh*kw*Cin, large spatial) pay the quantize pass +
int32 conv output without an MXU win. This sweeps K thresholds per model
to pick the default gate.

Same drift-proof protocol as tools/bench_quant.py (one process,
alternating rounds, token-chained reps, ratio of medians); calibrated
activation scales (the recommended mode).

Usage: python tools/bench_quant_gate.py [rounds] [batch] [model] [K ...]
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp
import optax

from pytorch_segmentation_tpu import quant
from pytorch_segmentation_tpu.data.pipeline import normalize_images
from pytorch_segmentation_tpu.engine.steps import create_train_state
from pytorch_segmentation_tpu.models import build_model
from pytorch_segmentation_tpu.nn import blocks
from pytorch_segmentation_tpu.ops.pallas.upsample_argmax import (
    fused_upsample_argmax)
from pytorch_segmentation_tpu.utils.runtime import setup_runtime


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    name = sys.argv[3] if len(sys.argv) > 3 else "deeplabv3plus"
    thresholds = [int(a) for a in sys.argv[4:]] or [0, 576, 1152, 2304,
                                                    4608, 9216]
    IMG = 513 if name == "deeplabv3plus" else 512
    setup_runtime()
    model = build_model(name, num_classes=21, dtype=jnp.bfloat16,
                        full_res_output=False)
    print(f"model: {name} @ {IMG}^2 bs{B}  K sweep: {thresholds}",
          flush=True)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               optax.sgd(1e-3))
    apply_fn = state.apply_fn
    images = jax.random.randint(jax.random.PRNGKey(3), (B, IMG, IMG, 3),
                                0, 255, jnp.uint8)
    qs = quant.calibrate(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        [normalize_images(images[:max(1, B // 4)], jnp.float32)])

    def make_serve(min_k):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if min_k is not None:
            variables = {**variables, "quant_stats": qs}

        def serve(variables, images_u8, tok):
            x = normalize_images(images_u8 + tok, jnp.float32)
            if min_k is None:
                logits = apply_fn(variables, x, train=False)
            else:
                prev = blocks.get_quant_min_k()
                blocks.set_quant_min_k(min_k)
                try:
                    with quant.quant_mode("int8"):
                        logits = apply_fn(variables, x, train=False)
                finally:
                    blocks.set_quant_min_k(prev)
            masks = fused_upsample_argmax(logits, (IMG, IMG),
                                          align_corners=True)
            return masks, logits, (masks[0, 0, 0] * 0).astype(jnp.uint8)
        return jax.jit(serve), variables

    variants = {None: make_serve(None)}
    for kth in thresholds:
        variants[kth] = make_serve(kth)

    outs = {}
    for key, (serve, variables) in variants.items():
        masks, logits, _ = serve(variables, images, jnp.zeros((), jnp.uint8))
        outs[key] = (masks, logits.astype(jnp.float32))
        int(masks[0, 0, 0])
        print(f"K={key if key is not None else 'bf16'}: compiled+ran",
              flush=True)
    mref, lref = outs[None]
    for kth in thresholds:
        m, lo = outs[kth]
        agree = float(jnp.mean((m == mref).astype(jnp.float32)))
        cos = float(jnp.sum(lo * lref)
                    / (jnp.linalg.norm(lo) * jnp.linalg.norm(lref)))
        print(f"K={kth}: mask agreement {agree:.4f}  logits cos {cos:.5f}",
              flush=True)

    def window(key, reps=8):
        serve, variables = variants[key]
        tok = jnp.zeros((), jnp.uint8)
        t0 = time.perf_counter()
        for _ in range(reps):
            masks, _, tok = serve(variables, images, tok)
        int(tok)
        return (time.perf_counter() - t0) / reps * 1e3

    ab = {key: [] for key in variants}
    for r in range(rounds):
        for key in ab:
            ab[key].append(window(key))
        print("round %d: " % r + "  ".join(
            f"{'bf16' if k is None else 'K=%d' % k} {ab[k][-1]:6.1f}ms"
            for k in ab), flush=True)
    med = {k: statistics.median(v) for k, v in ab.items()}
    base = med[None]
    print(f"bs{B} medians: bf16 {base:.1f} ms ({B/base*1e3:.1f} img/s)",
          flush=True)
    for kth in thresholds:
        print(f"  K>={kth}: {med[kth]:.1f} ms ({B/med[kth]*1e3:.1f} img/s, "
              f"{base/med[kth]:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
