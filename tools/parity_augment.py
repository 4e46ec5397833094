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
    # deconfounders for the bars study (round 5): same order distribution
    # / same carry, isolating one factor each
    "banded-o1": AugmentConfig(image_warp_order=1),
    "gather-u8": AugmentConfig(banded_warp=False),
    "gather-f32": AugmentConfig(banded_warp=False, photo_carry="f32"),
}


def _make_u8_shapes(n, hw, rng):
    """Raw (pre-normalization) u8 images + labels via the shared
    generator (tools/parity_e2e.py draws normalized f32; reverse it)."""
    from parity_e2e import make_shapes_data
    xs, ys = make_shapes_data(n, hw, rng)
    u8 = np.clip((xs * IMAGENET_STD + IMAGENET_MEAN) * 255.0 + 0.5,
                 0, 255).astype(np.uint8)
    return u8, ys.astype(np.uint8)


def _make_u8_bars(n, hw, rng):
    """Orientation-sensitive task (VERDICT r4 #8): thin rotated bars whose
    CLASS is keyed to orientation — class 1 for |angle| < 45 deg to the
    horizontal, class 2 otherwise. Any augmentation realization that
    mishandles rotation (fast-augment's 90-deg snap, the banded warp's
    cross-pass parallelogram approximation on rotated maps) shows up as
    a class-flip/blur cost here, unlike the near-isotropic shapes task."""
    import cv2
    xs = np.empty((n, hw, hw, 3), np.uint8)
    ys = np.empty((n, hw, hw), np.uint8)
    for i in range(n):
        img = np.full((hw, hw, 3), rng.integers(40, 216, 3), np.uint8)
        img = (img + rng.normal(0, 8, img.shape)).clip(0, 255).astype(
            np.uint8)
        lbl = np.zeros((hw, hw), np.uint8)
        for _ in range(int(rng.integers(2, 5))):
            ang = float(rng.uniform(0, 180.0))
            cls = 1 if min(ang, 180.0 - ang) < 45.0 else 2
            cx, cy = rng.integers(hw // 5, 4 * hw // 5, 2)
            ln = int(rng.integers(hw // 3, 2 * hw // 3))
            th = int(rng.integers(2, max(3, hw // 24)))
            box = cv2.boxPoints(((float(cx), float(cy)),
                                 (float(ln), float(th)), ang))
            pts = np.clip(box, 1, hw - 2).astype(np.int32)
            color = tuple(int(c) for c in rng.integers(0, 255, 3))
            cv2.fillPoly(img, [pts], color)
            cv2.fillPoly(lbl, [pts], int(cls))
        xs[i] = img
        ys[i] = lbl
    return xs, ys


def _make_u8_instance(n, hw, rng):
    """Instance-crop task scenes (VERDICT r4 #3): a 2*hw context canvas
    with unlabeled distractor shapes anywhere + ONE labeled shape fully
    inside the center hw crop. Models train on the center crop; the ring
    outside it is what the production crop-then-augment pipeline replaces
    with boundary fill where the reference (augment-then-crop,
    utils/datasets.py:346-391) shows true image content."""
    import cv2
    ctx = 2 * hw
    xs = np.empty((n, ctx, ctx, 3), np.uint8)
    ys = np.zeros((n, ctx, ctx), np.uint8)
    off = hw // 2
    for i in range(n):
        img = np.full((ctx, ctx, 3), rng.integers(40, 216, 3), np.uint8)
        img = (img + rng.normal(0, 8, img.shape)).clip(0, 255).astype(
            np.uint8)
        lbl = np.zeros((ctx, ctx), np.uint8)
        for _ in range(int(rng.integers(2, 5))):  # unlabeled distractors
            cx, cy = rng.integers(hw // 8, ctx - hw // 8, 2)
            r = int(rng.integers(hw // 8, hw // 3))
            pts = np.clip(np.array(
                [[cx - r, cy - r], [cx + r, cy - r], [cx + r, cy + r],
                 [cx - r, cy + r]]), 1, ctx - 2).astype(np.int32)
            cv2.fillPoly(img, [pts], tuple(int(c)
                                           for c in rng.integers(0, 255, 3)))
        # the labeled instance, fully inside the center crop
        cls = int(rng.integers(1, 3))
        cx = int(rng.integers(off + hw // 4, off + 3 * hw // 4))
        cy = int(rng.integers(off + hw // 4, off + 3 * hw // 4))
        r = int(rng.integers(hw // 8, hw // 5))
        if cls == 1:
            poly = [[cx - r, cy - r], [cx + r, cy - r], [cx + r, cy + r],
                    [cx - r, cy + r]]
        else:
            poly = [[cx, cy - r], [cx + r, cy + r], [cx - r, cy + r]]
        pts = np.asarray(poly, np.int32)
        cv2.fillPoly(img, [pts], tuple(int(c)
                                       for c in rng.integers(0, 255, 3)))
        cv2.fillPoly(lbl, [pts], cls)
        xs[i] = img
        ys[i] = lbl
    return xs, ys


def make_instance_runner(truebg, steps, hw, bs, train_n, val_n, lr=1e-2):
    """Paired A/B of the production crop-then-augment boundary fill vs
    the reference's augment-then-crop TRUE background (VERDICT r4 #3).
    Both variants consume IDENTICAL keys (same geometry, same labels, the
    legacy gather sampler); truebg=True samples the image from the 2*hw
    context canvas at crop-frame coords + offset, so out-of-crop taps
    read true image content and constant fill applies only beyond the
    context (= the reference's out-of-IMAGE fill). Labels always take the
    production path — the established label-equivalence (datasets.py
    docstring) keeps supervision identical; only the image ring moves."""
    from pytorch_segmentation_tpu.data import augment as A
    cfg = A.AugmentConfig(banded_warp=False, separable_warp=False)
    ctx, off = 2 * hw, hw // 2
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    model = UNet(num_classes=NC, dtype=jnp.float32)
    tx = optax.sgd(optax.polynomial_schedule(lr, 0.0, 0.9, steps),
                   momentum=0.9)
    step = make_train_step(accumulate=1, donate=False)

    @jax.jit
    def train_all(state, key, idx_dev, xu8j, yu8j):
        step_t = getattr(step, "jitted", step)

        def body(s, i):
            k = jax.random.fold_in(key, i)
            xb, yb = xu8j[idx_dev[i]], yu8j[idx_dev[i]]
            cx = xb[:, off:off + hw, off:off + hw]
            cy = yb[:, off:off + hw, off:off + hw]
            keys = jax.random.split(k, bs)
            gates = jax.vmap(lambda kk: A._someof_gates(
                jax.random.fold_in(kk, 1), cfg))(keys)

            def coords(kk, g):
                return A._geometric_coords(jax.random.fold_in(kk, 2),
                                           hw, hw, g, cfg)
            sy, sx, mode, cval, use_bil, dy, dx = jax.vmap(coords)(keys,
                                                                   gates)
            # labels: ALWAYS the production crop path (identical in both)
            _, sg = A._sample_nearest_packed(cx, cy, sy, sx, mode, cval,
                                             dither_y=dy, dither_x=dx)
            if truebg:
                im, _ = A._sample_nearest_packed(
                    xb, yb, sy + off, sx + off, mode, cval,
                    dither_y=dy, dither_x=dx)
            else:
                im, _ = A._sample_nearest_packed(cx, cy, sy, sx, mode,
                                                 cval, dither_y=dy,
                                                 dither_x=dx)
            im = A._photometric_batch(jax.random.fold_in(k, 3), keys, im,
                                      gates, cfg)
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
        xu8, yu8 = _make_u8_instance(train_n, hw, rng)
        vxc, vyc = _make_u8_instance(val_n, hw, rng)
        vx = vxc[:, off:off + hw, off:off + hw]
        vy = vyc[:, off:off + hw, off:off + hw]
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


def make_runner(cfg, steps, hw, bs, train_n, val_n, lr=1e-2,
                data_fn=None):
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
        gen = data_fn or _make_u8_shapes
        rng = np.random.default_rng(seed)
        xu8, yu8 = gen(train_n, hw, rng)
        vx, vy = gen(val_n, hw, rng)
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
    ap.add_argument("--task", default="shapes",
                    choices=["shapes", "bars", "instance"],
                    help="shapes: the round-4 near-isotropic task; bars: "
                         "orientation-keyed thin bars (VERDICT r4 #8); "
                         "instance: crop-fill truebg A/B (VERDICT r4 #3 — "
                         "--variants is ignored, the two fill variants "
                         "run instead)")
    ap.add_argument("--out", default="")
    opt = ap.parse_args()
    setup_runtime()

    if opt.task == "instance":
        rows = {}
        for name, truebg in (("prod-fill", False), ("truebg", True)):
            run = make_instance_runner(truebg, opt.steps, opt.hw, opt.bs,
                                       opt.train_n, opt.val_n)
            mious = []
            for s in range(opt.seeds):
                t0 = time.time()
                m = run(seed=100 + s)
                mious.append(m)
                print(f"{name:14s} seed {s}: mIoU {m:.4f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
            rows[name] = mious
        base = np.mean(rows["prod-fill"])
        lines = ["| variant | mIoU (mean ± sd over seeds) | Δ vs prod |",
                 "|---|---|---|"]
        for name, v in rows.items():
            lines.append(f"| {name} | {np.mean(v):.4f} ± {np.std(v):.4f} "
                         f"| {np.mean(v) - base:+.4f} |")
        table = "\n".join(lines)
        print(table)
        if opt.out:
            with open(opt.out, "a") as f:
                f.write(f"\n## parity_augment --task instance --steps "
                        f"{opt.steps} --seeds {opt.seeds} (UNet "
                        f"{opt.hw}^2 center crops of 2x context)\n\n"
                        f"{table}\n")
        return

    data_fn = {"shapes": None, "bars": _make_u8_bars}[opt.task]
    rows = {}
    for name in opt.variants.split(","):
        run = make_runner(VARIANTS[name], opt.steps, opt.hw, opt.bs,
                          opt.train_n, opt.val_n, data_fn=data_fn)
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
            f.write(f"\n## parity_augment --task {opt.task} --steps "
                    f"{opt.steps} --seeds {opt.seeds} (UNet {opt.hw}^2)"
                    f"\n\n{table}\n")


if __name__ == "__main__":
    main()
