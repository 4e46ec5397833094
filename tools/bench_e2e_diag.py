#!/usr/bin/env python3
"""Diagnose the default-policy e2e gap: augment-only (91 ms) + step-only
(134 ms) should give ~142 img/s, measured 92. Times prep-only, step-only,
and alternating prep+step in ONE process, same arrays."""

import time

import jax
import jax.numpy as jnp
import optax

from pytorch_segmentation_tpu.data.augment import (AugmentConfig,
                                                   make_augment_fn)
from pytorch_segmentation_tpu.data.pipeline import normalize_images
from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import DeepLabV3Plus
from pytorch_segmentation_tpu.ops.loss import make_loss_fn
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

B, H, W = 32, 513, 513


def main():
    setup_runtime()
    model = DeepLabV3Plus(num_classes=21, dtype=jnp.bfloat16,
                          full_res_output=False)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               optax.sgd(1e-3, momentum=0.9))
    step = make_train_step(loss_fn=make_loss_fn(align_corners=True),
                           accumulate=1)
    aug = make_augment_fn(AugmentConfig())

    @jax.jit
    def prep(rng, images, segs):
        img, seg = aug(rng, images, segs)
        return normalize_images(img, jnp.float32), seg

    key = jax.random.PRNGKey(1)
    images = jax.random.randint(key, (B, H, W, 3), 0, 255, jnp.uint8)
    segs = jnp.zeros((B, H, W), jnp.uint8)

    im, sg = prep(key, images, segs)
    s, loss = step(state, im, sg)
    float(loss)

    n = 8
    t0 = time.perf_counter()
    for i in range(n):
        im2, sg2 = prep(jax.random.fold_in(key, i), images, segs)
    float(jnp.max(im2[0, 0, 0]))
    print(f"prep-only:  {(time.perf_counter() - t0) / n * 1e3:7.1f} ms/it",
          flush=True)

    # same program but tiny outputs: isolates output-fetch/tunnel overhead
    @jax.jit
    def prep_tiny(rng, images, segs):
        img, seg = aug(rng, images, segs)
        img = normalize_images(img, jnp.float32)
        return img[0, :2, :2, 0], seg[0, :2, :2]

    a, b = prep_tiny(key, images, segs)
    float(jnp.max(a))
    t0 = time.perf_counter()
    for i in range(n):
        a, b = prep_tiny(jax.random.fold_in(key, i), images, segs)
    float(jnp.max(a))
    print(f"prep-tiny:  {(time.perf_counter() - t0) / n * 1e3:7.1f} ms/it",
          flush=True)

    # keys precomputed: isolates the per-iter fold_in dispatch
    ks = [jax.random.fold_in(key, i) for i in range(n)]
    jax.block_until_ready(ks)
    t0 = time.perf_counter()
    for i in range(n):
        im2, sg2 = prep(ks[i], images, segs)
    float(jnp.max(im2[0, 0, 0]))
    print(f"prep-pkeys: {(time.perf_counter() - t0) / n * 1e3:7.1f} ms/it",
          flush=True)

    t0 = time.perf_counter()
    for i in range(n):
        s, loss = step(s, im, sg)
    float(loss)
    print(f"step-only:  {(time.perf_counter() - t0) / n * 1e3:7.1f} ms/it",
          flush=True)

    t0 = time.perf_counter()
    for i in range(n):
        im2, sg2 = prep(jax.random.fold_in(key, i), images, segs)
        s, loss = step(s, im2, sg2)
    float(loss)
    print(f"prep+step:  {(time.perf_counter() - t0) / n * 1e3:7.1f} ms/it",
          flush=True)


if __name__ == "__main__":
    main()
