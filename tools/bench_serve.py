#!/usr/bin/env python3
"""Interleaved A/B of the serving path (u8 batch -> normalize -> DLV3+
forward -> full-res argmax mask) on the bench config (513^2 bf16 bs32):

  A: plain XLA — resize_bilinear(logits f32, 513^2) + argmax
     (materializes the [32,513,513,21] f32 upsampled tensor, ~700 MB)
  B: fused Pallas upsample+argmax (ops/pallas/upsample_argmax.py)

Same drift-proof protocol as tools/bench_ab.py: both variants in ONE
process, alternating rounds, judge by the ratio of medians. Reps chain
through an in-program token so the window times sequential executions.

Usage: python tools/bench_serve.py [rounds] [batch] [model]  (default 5
rounds, batch 32, deeplabv3plus; batch 1 gives the serving latency SLO
number; model is any zoo name — fpn/hrnet upsample x4 align=False)
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp
import optax

from pytorch_segmentation_tpu.data.pipeline import normalize_images
from pytorch_segmentation_tpu.engine.steps import create_train_state
from pytorch_segmentation_tpu.models import build_model
from pytorch_segmentation_tpu.ops.pallas.upsample_argmax import (
    fused_upsample_argmax)
from pytorch_segmentation_tpu.ops.resize import resize_bilinear
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

IMG = 513  # per-model override below: /32 models need 512 (hrnet's
# shape-doubling fuse and unet's upsample2x+concat reject 513)
SIZES = {"unet": 512, "deeplabv3plus": 513, "hrnet": 512, "pspnet": 513,
         "fpn": 512, "fastfcn": 513, "segformer": 512, "danet": 512}
B = 32  # overridden by argv[2]


def main():
    global B
    if len(sys.argv) > 2:
        B = int(sys.argv[2])
    global IMG
    setup_runtime()
    name = sys.argv[3] if len(sys.argv) > 3 else "deeplabv3plus"
    IMG = SIZES.get(name, IMG)
    model = build_model(name, num_classes=21, dtype=jnp.bfloat16,
                        full_res_output=False)
    align = getattr(model, "up_align_corners", True)
    print(f"model: {name} @ {IMG}^2  align_corners={align}", flush=True)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               optax.sgd(1e-3))
    apply_fn = state.apply_fn

    def make_serve(fused):
        def serve(params, batch_stats, images_u8, tok):
            x = normalize_images(images_u8 + tok, jnp.float32)
            logits = apply_fn({"params": params,
                               "batch_stats": batch_stats}, x, train=False)
            if fused:
                masks = fused_upsample_argmax(logits, (IMG, IMG),
                                              align_corners=align)
            else:
                up = resize_bilinear(logits.astype(jnp.float32), (IMG, IMG),
                                     align_corners=align)
                masks = jnp.argmax(up, axis=-1).astype(jnp.int32)
            return masks, (masks[0, 0, 0] * 0).astype(jnp.uint8)
        return jax.jit(serve)

    serve_a = make_serve(fused=False)
    serve_b = make_serve(fused=True)
    images = jax.random.randint(jax.random.PRNGKey(3), (B, IMG, IMG, 3),
                                0, 255, jnp.uint8)

    def window(serve, reps=8):
        tok = jnp.zeros((), jnp.uint8)
        masks, tok = serve(state.params, state.batch_stats, images, tok)
        int(masks[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(reps):
            masks, tok = serve(state.params, state.batch_stats, images, tok)
        int(tok)
        return (time.perf_counter() - t0) / reps * 1e3  # ms/batch

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    ab = {"xla": [], "pallas": []}
    for r in range(rounds):
        ab["xla"].append(window(serve_a))
        ab["pallas"].append(window(serve_b))
        print(f"round {r}: xla {ab['xla'][-1]:7.1f} ms  "
              f"pallas {ab['pallas'][-1]:7.1f} ms", flush=True)
    ma, mb = (statistics.median(ab[k]) for k in ("xla", "pallas"))
    print(f"bs{B} medians: xla {ma:.1f} ms ({B / ma * 1e3:.1f} img/s)  "
          f"pallas {mb:.1f} ms ({B / mb * 1e3:.1f} img/s)  "
          f"speedup {ma / mb:.3f}x")


if __name__ == "__main__":
    main()
