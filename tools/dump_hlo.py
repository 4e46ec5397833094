#!/usr/bin/env python3
"""AOT-compile the bench train step with --xla_dump_to and keep the
after-optimizations HLO for inspection (no execution needed).

Usage: XLA_FLAGS="--xla_dump_to=/tmp/hlo_dump --xla_dump_hlo_pass_re=$" \
       python tools/dump_hlo.py
"""

import os
import sys

os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_dump_to=/tmp/hlo_dump --xla_dump_hlo_as_text")
# plain jax.jit (has .lower) instead of the jit_with_options wrapper
os.environ["PSEG_XLA_OPTS"] = ""

import jax
import jax.numpy as jnp
import optax


def main():
    from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                       make_train_step)
    from pytorch_segmentation_tpu.models import DeepLabV3Plus
    from pytorch_segmentation_tpu.ops.loss import make_loss_fn
    from pytorch_segmentation_tpu.utils.runtime import setup_runtime

    setup_runtime()
    on_tpu = jax.devices()[0].platform == "tpu"
    img = 513 if on_tpu else 129
    bs = 32 if on_tpu else 4
    model = DeepLabV3Plus(num_classes=21, dtype=jnp.bfloat16,
                          full_res_output=not on_tpu)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               optax.sgd(1e-3, momentum=0.9))
    step = make_train_step(loss_fn=make_loss_fn(align_corners=True,
                                                use_pallas=on_tpu),
                           accumulate=1)
    images = jax.ShapeDtypeStruct((bs, img, img, 3), jnp.float32)
    segs = jax.ShapeDtypeStruct((bs, img, img), jnp.int32)
    compiled = step.lower(state, images, segs).compile()
    print("compiled ok; memory:", compiled.memory_analysis())
    # the runtime is tunneled: --xla_dump_to writes on the REMOTE server, so
    # serialize the optimized HLO locally instead
    try:
        txt = compiled.as_text()
        out = "/tmp/step_optimized.hlo"
        with open(out, "w") as f:
            f.write(txt)
        print("wrote", out, len(txt), "bytes")
    except Exception as e:
        print("as_text failed:", e)


if __name__ == "__main__":
    main()
