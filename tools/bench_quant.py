#!/usr/bin/env python3
"""Interleaved A/B of the int8 PTQ serving path vs bf16 (quant.py).

Variants, all ending in the fused Pallas upsample+argmax kernel (the
production serving tail):

  bf16    — the shipped make_predict_step path
  int8    — calibrated per-tensor activation scales (quant.calibrate)
  int8dyn — dynamic activation scales (abs-max of the live batch)

Same drift-proof protocol as tools/bench_serve.py (one process,
alternating rounds, token-chained reps, ratio of medians). Also reports
mask agreement and logits cosine of int8 vs bf16 — the accuracy side of
the PTQ trade.

Usage: python tools/bench_quant.py [rounds] [batch] [model]
(model is any zoo name, default deeplabv3plus)
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
from pytorch_segmentation_tpu.ops.pallas.upsample_argmax import (
    fused_upsample_argmax)
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

IMG = 513
B = 32


def main():
    global IMG, B
    if len(sys.argv) > 2:
        B = int(sys.argv[2])
    name = sys.argv[3] if len(sys.argv) > 3 else "deeplabv3plus"
    if name != "deeplabv3plus":
        IMG = 512  # UNet/HRNet stride chains want /32-divisible sizes
    setup_runtime()
    model = build_model(name, num_classes=21, dtype=jnp.bfloat16,
                        full_res_output=False)
    print(f"model: {name} @ {IMG}^2 bs{B}", flush=True)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               optax.sgd(1e-3))
    apply_fn = state.apply_fn
    images = jax.random.randint(jax.random.PRNGKey(3), (B, IMG, IMG, 3),
                                0, 255, jnp.uint8)

    print("calibrating...", flush=True)
    t0 = time.perf_counter()
    qs = quant.calibrate(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        [normalize_images(images[:max(1, B // 4)], jnp.float32)])
    print(f"calibrated ({time.perf_counter() - t0:.0f}s)", flush=True)

    def make_serve(mode):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if mode == "int8":
            variables = {**variables, "quant_stats": qs}

        def serve(variables, images_u8, tok):
            x = normalize_images(images_u8 + tok, jnp.float32)
            if mode is None:
                logits = apply_fn(variables, x, train=False)
            else:
                with quant.quant_mode(mode):
                    logits = apply_fn(variables, x, train=False)
            masks = fused_upsample_argmax(logits, (IMG, IMG),
                                          align_corners=True)
            return masks, logits, (masks[0, 0, 0] * 0).astype(jnp.uint8)
        return jax.jit(serve), variables

    variants = {None: make_serve(None), "int8": make_serve("int8"),
                "int8dyn": make_serve("int8dyn")}

    # accuracy side: masks + logits of each variant on the SAME batch
    outs = {}
    for mode, (serve, variables) in variants.items():
        masks, logits, _ = serve(variables, images, jnp.zeros((), jnp.uint8))
        outs[mode] = (masks, logits)
        int(masks[0, 0, 0])
        print(f"{mode or 'bf16'}: compiled+ran", flush=True)
    mref, lref = outs[None]
    lref = lref.astype(jnp.float32)
    for mode in ("int8", "int8dyn"):
        m, lo = outs[mode]
        agree = float(jnp.mean((m == mref).astype(jnp.float32)))
        lo = lo.astype(jnp.float32)
        cos = float(jnp.sum(lo * lref)
                    / (jnp.linalg.norm(lo) * jnp.linalg.norm(lref)))
        print(f"{mode} vs bf16: mask agreement {agree:.4f}  "
              f"logits cos {cos:.5f}", flush=True)

    def window(mode, reps=8):
        serve, variables = variants[mode]
        tok = jnp.zeros((), jnp.uint8)
        t0 = time.perf_counter()
        for _ in range(reps):
            masks, _, tok = serve(variables, images, tok)
        int(tok)
        return (time.perf_counter() - t0) / reps * 1e3

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    ab = {None: [], "int8": [], "int8dyn": []}
    for r in range(rounds):
        for mode in ab:
            ab[mode].append(window(mode))
        print(f"round {r}: bf16 {ab[None][-1]:6.1f} ms  "
              f"int8 {ab['int8'][-1]:6.1f} ms  "
              f"int8dyn {ab['int8dyn'][-1]:6.1f} ms", flush=True)
    med = {k: statistics.median(v) for k, v in ab.items()}
    print(f"bs{B} medians: "
          f"bf16 {med[None]:.1f} ms ({B/med[None]*1e3:.1f} img/s)  "
          f"int8 {med['int8']:.1f} ms ({B/med['int8']*1e3:.1f} img/s, "
          f"{med[None]/med['int8']:.3f}x)  "
          f"int8dyn {med['int8dyn']:.1f} ms "
          f"({B/med['int8dyn']*1e3:.1f} img/s, "
          f"{med[None]/med['int8dyn']:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
