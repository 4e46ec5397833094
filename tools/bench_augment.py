#!/usr/bin/env python3
"""TPU measurement of the on-device augmentation path (PERF.md):

1. augmentation-only ms/batch at 32x513^2 for: default policy (per-image
   warp order sampling), forced nearest (order=0), forced bilinear
   (order=1), --fast-augment;
2. end-to-end device throughput: augment + normalize + DLV3+ train step.

Sync rule: chain reps inside one jit / read a chained scalar (CLAUDE.md:
block_until_ready is unreliable on this runtime).
"""

import time

import jax
import jax.numpy as jnp

from pytorch_segmentation_tpu.data.augment import AugmentConfig, make_augment_fn
from pytorch_segmentation_tpu.data.pipeline import normalize_images
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

B, H, W = 32, 513, 513


def bench_augment(cfg, label, images, segs, reps=10):
    fn = make_augment_fn(cfg)

    @jax.jit
    def many(images, segs):
        # the carry must DEPEND on ALL outputs: consuming a single pixel
        # lets XLA slice gathers down to it (cf. tools/bench_peak.py:
        # y[0,0] "measured" 677 TFLOP/s), and an unused segs output is DCEd
        def body(c, i):
            rng = jax.random.fold_in(jax.random.PRNGKey(0), i + c)
            out_i, out_s = fn(rng, images, segs)
            tot = (jnp.sum(out_i) * 1e-9).astype(jnp.int32) + jnp.max(out_s)
            return tot % 5, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                            jnp.arange(reps))
        return c

    _ = int(many(images, segs))
    t0 = time.perf_counter()
    _ = int(many(images, segs))
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"augment [{label:24s}]: {ms:7.1f} ms/batch "
          f"({B / ms * 1e3:6.1f} img/s)", flush=True)
    return ms


def bench_e2e(cfg, label):
    import optax
    from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                       make_train_step)
    from pytorch_segmentation_tpu.models import DeepLabV3Plus
    from pytorch_segmentation_tpu.ops.loss import make_loss_fn

    model = DeepLabV3Plus(num_classes=21, dtype=jnp.bfloat16,
                          full_res_output=False)
    tx = optax.sgd(1e-3, momentum=0.9)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32), tx)
    step = make_train_step(loss_fn=make_loss_fn(align_corners=True),
                           accumulate=1)
    aug = make_augment_fn(cfg)

    key = jax.random.PRNGKey(1)

    @jax.jit
    def prep(step_i, images, segs):
        # fold inside the program — a host-side fold_in per batch is a
        # separate tiny dispatch costing ~190 ms on this tunneled runtime
        # (tools/bench_e2e_diag.py); production PostFetch does the same
        img, seg = aug(jax.random.fold_in(key, step_i), images, segs)
        # bf16 feed: the model's first conv casts to bf16 anyway, so this
        # is bit-identical downstream and halves the prep-out/step-in HBM
        return normalize_images(img, jnp.bfloat16), seg

    import numpy as np
    images = jax.random.randint(key, (B, H, W, 3), 0, 255, jnp.uint8)
    segs = jnp.zeros((B, H, W), jnp.uint8)
    # warm both programs
    im, sg = prep(np.uint32(0), images, segs)
    s, loss = step(state, im, sg)
    float(loss)
    n = 8
    t0 = time.perf_counter()
    for i in range(n):
        im, sg = prep(np.uint32(i), images, segs)
        s, loss = step(s, im, sg)
    float(loss)
    dt = time.perf_counter() - t0
    print(f"e2e [{label:24s}]: {B * n / dt:6.1f} img/s", flush=True)


def main():
    setup_runtime()
    assert jax.devices()[0].platform == "tpu"
    key = jax.random.PRNGKey(2)
    images = jax.random.randint(key, (B, H, W, 3), 0, 255, jnp.uint8)
    segs = jnp.zeros((B, H, W), jnp.uint8)
    bench_augment(AugmentConfig(image_warp_order=0), "order=0 (nearest)",
                  images, segs)
    bench_augment(AugmentConfig(image_warp_order=1), "order=1 (bilinear)",
                  images, segs)
    bench_augment(AugmentConfig(), "default (order~[0,1])", images, segs)
    bench_augment(AugmentConfig(fast_geometric=True), "fast-augment",
                  images, segs)
    bench_e2e(AugmentConfig(), "default e2e")
    bench_e2e(AugmentConfig(fast_geometric=True), "fast-augment e2e")


def ab_twopass():
    """Interleaved A/B: legacy global-gather vs separable two-pass warp
    (drift-proof: both programs alive in one process, alternating rounds)."""
    setup_runtime()
    assert jax.devices()[0].platform == "tpu"
    key = jax.random.PRNGKey(2)
    images = jax.random.randint(key, (B, H, W, 3), 0, 255, jnp.uint8)
    segs = jnp.zeros((B, H, W), jnp.uint8)
    cases = [
        ("legacy default", AugmentConfig(banded_warp=False,
                                         separable_warp=False)),
        ("banded default", AugmentConfig(banded_warp=True)),
        ("twopass default", AugmentConfig(banded_warp=False,
                                          separable_warp=True)),
        ("legacy order=1", AugmentConfig(banded_warp=False,
                                         separable_warp=False,
                                         image_warp_order=1)),
        ("banded order=1", AugmentConfig(banded_warp=True,
                                         image_warp_order=1)),
        ("legacy psample-photo", AugmentConfig(
            banded_warp=False, separable_warp=False,
            per_sample_photo_order=True)),
        ("legacy rbg-rng", AugmentConfig(banded_warp=False,
                                         separable_warp=False,
                                         rng_impl="rbg")),
        ("pool u8 (default)", AugmentConfig(photo_carry="u8")),
        ("pool bf16", AugmentConfig(photo_carry="bf16")),
        ("pool f32", AugmentConfig(photo_carry="f32")),
    ]
    import sys
    if len(sys.argv) > 2:  # substring filter: bench_augment.py ab rbg
        cases = [(l, c) for l, c in cases if sys.argv[2] in l]
    results = {label: [] for label, _ in cases}
    for r in range(3):
        for label, cfg in cases:
            results[label].append(
                bench_augment(cfg, f"{label} r{r}", images, segs))
    for label, v in results.items():
        print(f"median [{label}]: {sorted(v)[1]:.1f} ms/batch", flush=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "ab":
        ab_twopass()
    else:
        main()
