#!/usr/bin/env python3
"""Capture a jax.profiler trace of a model's train step (513^2 or 512^2
bf16 bs32, fused Pallas loss) and print the per-op time breakdown via
tools/xplane_summary.py.

Usage: python tools/profile_step.py [outdir=/tmp/pseg_trace] [model]
"""

import glob
import os
import sys

import jax
import jax.numpy as jnp
import optax


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pseg_trace"
    from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                       make_train_step)
    from pytorch_segmentation_tpu.models import MODEL_REGISTRY
    from pytorch_segmentation_tpu.ops.loss import make_loss_fn
    from pytorch_segmentation_tpu.utils.runtime import setup_runtime

    setup_runtime()
    on_tpu = jax.devices()[0].platform == "tpu"
    name = sys.argv[2] if len(sys.argv) > 2 else "deeplabv3plus"
    # /32 models reject 513 (see tools/bench_models.py)
    img513 = name in ("deeplabv3plus", "pspnet", "fastfcn")
    img = (513 if img513 else 512) if on_tpu else 129
    bs = 32 if on_tpu else 4
    model = MODEL_REGISTRY[name](num_classes=21, dtype=jnp.bfloat16,
                                 full_res_output=not on_tpu)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               optax.sgd(1e-3, momentum=0.9))
    align = getattr(model, "up_align_corners", True)
    step = make_train_step(loss_fn=make_loss_fn(align_corners=align,
                                                use_pallas=on_tpu),
                           accumulate=1)
    images = jax.random.normal(jax.random.PRNGKey(1), (bs, img, img, 3),
                               jnp.float32)
    segs = jnp.zeros((bs, img, img), jnp.int32)
    for _ in range(3):
        state, loss = step(state, images, segs)
    float(loss)  # host-read barrier (block_until_ready unreliable here)
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, loss = step(state, images, segs)
        float(loss)
    pbs = sorted(glob.glob(os.path.join(outdir,
                                        "plugins/profile/*/*.xplane.pb")))
    print("trace:", pbs[-1] if pbs else "NOT FOUND")
    if pbs:
        sys.path.insert(0, os.path.dirname(__file__))
        import xplane_summary
        xplane_summary.main(pbs[-1])


if __name__ == "__main__":
    main()
