"""Accuracy cost of every documented augmentation approximation
(VERDICT r3 next #3): one harness, paired seeds, synthetic-shapes data —
train the same model under each augmentation REALIZATION and compare
converged val mIoU. The perf cost of each variant is measured to three
digits in PERF.md; this supplies the missing accuracy half.

Variants (all distributions documented in data/augment.py):
  banded        — two-pass banded-matmul warp, deterministic exact
                  per-pass bilinear, bf16 photometric carry (DEFAULT)
  gather        — round-3 default: packed single-tap stochastic-bilinear
                  gather warp, f32 photometric carry
  exact4        — gather warp with exact 4-tap bilinear (order=1): the
                  highest-fidelity reference realization
  fast          — --fast-augment (90-deg snap + separable matmul warp,
                  shear/perspective/elastic dropped)
  psample-photo — per-SAMPLE photometric op order (the reference's exact
                  SomeOf random_order semantics; 0.21x perf)
  f32-pool      — banded warp with the f32 photometric carry

Each run: UNet (full MNv2 encoder) on 64^2 synthetic shapes, augmented
batches, poly-decayed SGD to convergence, clean-val mIoU. Paired seeds:
every variant sees identical raw data and batch order; several seeds
give the spread. Runs on TPU (fast) or CPU (slow; banded falls back to
the dense reference resampler).

    python tools/parity_augment.py --steps 600 --seeds 3 --out PARITY_AUGMENT.md
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
import optax

from pytorch_segmentation_tpu.data.augment import (AugmentConfig,
                                                   make_augment_fn)
from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import UNet
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
NC = 3

VARIANTS = {
    "banded": AugmentConfig(),
    "gather": AugmentConfig(banded_warp=False, photo_carry="f32"),
    "exact4": AugmentConfig(banded_warp=False, photo_carry="f32",
                            image_warp_order=1),
    "fast": AugmentConfig(fast_geometric=True),
    "psample-photo": AugmentConfig(per_sample_photo_order=True),
    "f32-pool": AugmentConfig(photo_carry="f32"),
    "bf16-pool": AugmentConfig(photo_carry="bf16"),
}


def _make_u8_shapes(n, hw, rng):
    """Raw (pre-normalization) u8 images + labels via the shared
    generator (tools/parity_e2e.py draws normalized f32; reverse it)."""
    from parity_e2e import make_shapes_data
    xs, ys = make_shapes_data(n, hw, rng)
    u8 = np.clip((xs * IMAGENET_STD + IMAGENET_MEAN) * 255.0 + 0.5,
                 0, 255).astype(np.uint8)
    return u8, ys.astype(np.uint8)


def make_runner(cfg, steps, hw, bs, train_n, val_n, lr=1e-2):
    """One compiled whole-training program per VARIANT, reused across
    seeds (data, batch order and rng key are arguments, so every seed
    hits the same executable — per-step dispatches crawl on this
    tunneled runtime, and per-seed closures would recompile)."""
    aug = make_augment_fn(cfg)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    model = UNet(num_classes=NC, dtype=jnp.float32)
    tx = optax.sgd(optax.polynomial_schedule(lr, 0.0, 0.9, steps),
                   momentum=0.9)
    step = make_train_step(accumulate=1, donate=False)

    @jax.jit
    def train_all(state, key, idx_dev, xu8j, yu8j):
        # the AOT-compiled step can't take tracers; trace its jit form
        step_t = getattr(step, "jitted", step)

        def body(s, i):
            k = jax.random.fold_in(key, i)
            b = idx_dev[i]
            im, sg = aug(k, xu8j[b], yu8j[b])
            im = (im / 255.0 - mean) / std
            s, loss = step_t(s, im, sg.astype(jnp.int32))
            return s, loss
        return jax.lax.scan(body, state, jnp.arange(steps))

    @jax.jit
    def predict(params, stats, x):
        return jnp.argmax(model.apply(
            {"params": params, "batch_stats": stats}, x, train=False), -1)

    def run(seed):
        rng = np.random.default_rng(seed)
        xu8, yu8 = _make_u8_shapes(train_n, hw, rng)
        vx, vy = _make_u8_shapes(val_n, hw, rng)
        vx_n = jnp.asarray((vx.astype(np.float32) / 255.0 - IMAGENET_MEAN)
                           / IMAGENET_STD)
        state = create_train_state(model, jax.random.PRNGKey(seed),
                                   jnp.zeros((1, hw, hw, 3), jnp.float32),
                                   tx)
        order = np.random.default_rng(seed + 1)
        idx = []
        while len(idx) < steps * bs:
            idx.extend(order.permutation(train_n))
        idx_dev = jnp.asarray(
            np.asarray(idx[:steps * bs]).reshape(steps, bs))
        state, losses = train_all(state, jax.random.PRNGKey(seed + 2),
                                  idx_dev, jnp.asarray(xu8),
                                  jnp.asarray(yu8))
        float(losses[-1])
        preds = np.concatenate(
            [np.asarray(predict(state.params, state.batch_stats,
                                vx_n[i:i + 8]))
             for i in range(0, val_n, 8)])
        from parity_e2e import miou_from_preds
        return miou_from_preds(preds, np.asarray(vy))

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--train-n", type=int, default=256)
    ap.add_argument("--val-n", type=int, default=96)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--out", default="")
    opt = ap.parse_args()
    setup_runtime()

    rows = {}
    for name in opt.variants.split(","):
        run = make_runner(VARIANTS[name], opt.steps, opt.hw, opt.bs,
                          opt.train_n, opt.val_n)
        mious = []
        for s in range(opt.seeds):
            t0 = time.time()
            m = run(seed=100 + s)
            mious.append(m)
            print(f"{name:14s} seed {s}: mIoU {m:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        rows[name] = mious

    base = np.mean(rows.get("banded", list(rows.values())[0]))
    lines = ["| variant | mIoU (mean ± sd over seeds) | Δ vs banded |",
             "|---|---|---|"]
    for name, v in rows.items():
        lines.append(f"| {name} | {np.mean(v):.4f} ± {np.std(v):.4f} | "
                     f"{np.mean(v) - base:+.4f} |")
    table = "\n".join(lines)
    print(table)
    if opt.out:
        with open(opt.out, "a") as f:
            f.write(f"\n## parity_augment --steps {opt.steps} --seeds "
                    f"{opt.seeds} (UNet 64^2 synthetic shapes)\n\n"
                    f"{table}\n")


if __name__ == "__main__":
    main()
