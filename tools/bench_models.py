#!/usr/bin/env python3
"""Train-step throughput for every model family @513^2 bf16 bs32 (one
process; best-of-3 windows per model — the chip is time-shared, see
PERF.md measurement protocol)."""

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
    bs = 32 if on_tpu else 4
    # DLV3+ handles the reference's odd 513; UNet/HRNet skip-concat wants
    # multiples of 32 (reference trains them at 320/512-style sizes)
    sizes = {"unet": 512, "deeplabv3plus": 513, "hrnet": 512,
             "pspnet": 513, "fpn": 512, "fastfcn": 513, "segformer": 512,
             "upernet": 512, "bisenetv2": 512, "ocrnet": 512,
             "fcn": 513, "deeplabv3": 513, "lraspp": 512, "segnext": 512,
             "segmenter": 512, "danet": 512, "maskformer": 512}
    import sys
    names = sys.argv[1:] or ("unet", "deeplabv3plus", "hrnet", "pspnet",
                             "fpn", "fastfcn", "upernet")
    from pytorch_segmentation_tpu.models import variant_kwargs
    for spec in names:
        name, _, variant = spec.partition(":")  # e.g. upernet:vit-b16
        variant, _, mtch = variant.partition("@")  # maskformer matcher
        img = sizes[name] if on_tpu else 128
        images = jax.random.normal(jax.random.PRNGKey(1),
                                   (bs, img, img, 3), jnp.float32)
        segs = jnp.zeros((bs, img, img), jnp.int32)
        model = MODEL_REGISTRY[name](num_classes=21, dtype=jnp.bfloat16,
                                     full_res_output=not on_tpu,
                                     **variant_kwargs(name, variant))
        align = getattr(model, "up_align_corners", True)
        if name == "maskformer":
            # set-prediction criterion; matcher via e.g.
            # `maskformer:r50@hungarian` (default sinkhorn, on device)
            from pytorch_segmentation_tpu.models import make_maskformer_loss
            loss_fn = make_maskformer_loss(21, matcher=mtch or "sinkhorn")
        else:
            loss_fn = make_loss_fn(align_corners=align, use_pallas=on_tpu)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3), jnp.float32),
                                   optax.sgd(1e-3, momentum=0.9))
        step = make_train_step(loss_fn=loss_fn, accumulate=1)
        s = state
        for _ in range(3):
            s, loss = step(s, images, segs)
        float(loss)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                s, loss = step(s, images, segs)
            float(loss)
            best = min(best, (time.perf_counter() - t0) / 8)
        print(f"{spec:16s} @{img}^2 {best * 1e3:8.2f} ms/step  "
              f"{bs / best:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
