#!/usr/bin/env python3
"""What --remat actually buys on chip: max resident batch and throughput
for a transformer family (SegFormer-B2 @512^2 bf16) with and without
block rematerialization.

For each (remat, bs) the FULL train step (fused loss, donated state)
compiles fresh in this process; RESOURCE_EXHAUSTED counts as "does not
fit". Throughput timing uses the donated-state loop with a host read of
the final loss (CLAUDE.md sync rules). Usage:
    python tools/bench_remat.py [variant] [bs ...]   (default b2, 16..64)
"""

import sys
import time

import jax
import jax.numpy as jnp
import optax

from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import build_model
from pytorch_segmentation_tpu.ops.loss import make_loss_fn
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

IMG = 512
REPS = 8


def try_config(variant: str, remat: bool, bs: int):
    model = build_model("segformer", num_classes=21, variant=variant,
                        dtype=jnp.bfloat16, full_res_output=False,
                        remat=remat)
    tx = optax.sgd(1e-3, momentum=0.9)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, IMG, IMG, 3)), tx)
    step = make_train_step(loss_fn=make_loss_fn(21), accumulate=1)
    images = jax.random.normal(jax.random.PRNGKey(1), (bs, IMG, IMG, 3))
    segs = jnp.zeros((bs, IMG, IMG), jnp.int32)
    try:
        state, loss = step(state, images, segs)
        _ = float(loss)  # forces execution (donated-state chain)
    except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED etc.
        if "RESOURCE_EXHAUSTED" in str(e):
            return None
        raise
    t0 = time.perf_counter()
    for _ in range(REPS):
        state, loss = step(state, images, segs)
    _ = float(loss)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    return ms


def main():
    setup_runtime()
    args = sys.argv[1:]
    variant = args[0] if args else "b2"
    sizes = [int(a) for a in args[1:]] or [16, 32, 48, 64]
    for remat in (False, True):
        for bs in sizes:
            ms = try_config(variant, remat, bs)
            tag = f"remat={int(remat)} bs={bs:3d}"
            if ms is None:
                print(f"{tag}: RESOURCE_EXHAUSTED", flush=True)
            else:
                print(f"{tag}: {ms:7.1f} ms/step  "
                      f"{bs / ms * 1e3:6.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
