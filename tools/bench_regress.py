"""Drift-proof cross-round perf comparison (VERDICT r3 #7, r4 #5).

The tunneled chip's absolute throughput drifts ~60% between processes
(CLAUDE.md), so cross-round BENCH claims must never compare two
single-process snapshots. This tool reconstructs each round's DEFAULT
configuration in ONE process and interleaves timed rounds of all
variants (tools/bench_ab.py protocol), reporting medians and ratios.

Round 5 covers the FULL BENCH surface (VERDICT r4 #5): augment policy,
e2e train incl. augmentation, device-only train step, fused serving, and
int8 serving. The train/serving code paths are unchanged r04 -> r05, so
those legs share one runner measured in the same windows — their ratio
is definitionally 1.0 and the rows document that non-delta; the moving
parts are policy and e2e. Round configs are code-level flags
(augment.AugmentConfig legacy_ops reconstructs the r04 program shapes:
conv blur, shift-add 3x3s, scan-of-switch pool, f32 kernel out/jitter).

Usage:
    python tools/bench_regress.py             # writes BENCH_REGRESS.json
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from pytorch_segmentation_tpu.data.augment import (AugmentConfig,
                                                   make_augment_fn)
from pytorch_segmentation_tpu.data.pipeline import normalize_images
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

B, H = 32, 513

# each round's DEFAULT augmentation configuration + feed dtype
ROUND_CFGS = {
    "r03": (dict(banded_warp=False, separable_warp=False,
                 photo_carry="f32", rng_impl=None, pool_compute="f32",
                 legacy_ops=True), jnp.float32),
    "r04": (dict(photo_carry="bf16", rng_impl=None, pool_compute="f32",
                 legacy_ops=True), jnp.float32),
    "r05": (dict(), jnp.bfloat16),  # u8 carry, rbg, MXU pool ops, bf16 feed
}


def _mk_policy(cfg_kw, images, segs, reps=8):
    fn = make_augment_fn(AugmentConfig(**cfg_kw))

    @jax.jit
    def many(images, segs):
        def body(c, i):
            rng = jax.random.fold_in(jax.random.PRNGKey(0), i + c)
            oi, os = fn(rng, images, segs)
            return (jnp.sum(oi) * 1e-9).astype(jnp.int32) + jnp.max(os), None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                            jnp.arange(reps))
        return c

    def run():
        t0 = time.perf_counter()
        int(many(images, segs))
        return (time.perf_counter() - t0) / reps * 1e3
    int(many(images, segs))  # compile
    return run


def _mk_e2e(cfg_kw, feed_dtype, step, state, images, segs, keys):
    aug = make_augment_fn(AugmentConfig(**cfg_kw))

    @jax.jit
    def prep(rng, images, segs):
        im, sg = aug(rng, images, segs)
        return normalize_images(im, feed_dtype), sg

    holder = {"s": state}

    def run():
        s = holder["s"]
        t0 = time.perf_counter()
        for k in keys:
            im, sg = prep(k, images, segs)
            s, loss = step(s, im, sg)
        float(loss)
        holder["s"] = s
        return (time.perf_counter() - t0) / len(keys) * 1e3
    # compile both programs once
    im, sg = prep(keys[0], images, segs)
    holder["s"], loss = step(holder["s"], im, sg)
    float(loss)
    return run


def _mk_train(step, state, bs, img):
    images = jax.random.normal(jax.random.PRNGKey(1), (bs, img, img, 3),
                               jnp.float32)
    segs = jnp.zeros((bs, img, img), jnp.int32)
    holder = {"s": state}
    for _ in range(2):
        holder["s"], loss = step(holder["s"], images, segs)
    float(loss)

    def run(n=8):
        s = holder["s"]
        t0 = time.perf_counter()
        for _ in range(n):
            s, loss = step(s, images, segs)
        float(loss)
        holder["s"] = s
        return (time.perf_counter() - t0) / n * 1e3
    return run


def _mk_serving(state, bs, img, int8=False):
    from pytorch_segmentation_tpu.ops.pallas.upsample_argmax import (
        fused_upsample_argmax)
    apply_fn = state.apply_fn
    images = jax.random.randint(jax.random.PRNGKey(3), (bs, img, img, 3),
                                0, 255, jnp.uint8)
    extra = {}
    if int8:
        from pytorch_segmentation_tpu import quant
        qs = quant.calibrate(
            apply_fn.__self__,
            {"params": state.params, "batch_stats": state.batch_stats},
            [normalize_images(images[:max(1, bs // 4)], jnp.float32)])
        extra = {"quant_stats": qs}

    @jax.jit
    def serve(params, batch_stats, images_u8, tok):
        x = normalize_images(images_u8 + tok, jnp.float32)
        variables = {"params": params, "batch_stats": batch_stats, **extra}
        if int8:
            from pytorch_segmentation_tpu.quant import quant_mode
            with quant_mode("int8"):
                logits = apply_fn(variables, x, train=False)
        else:
            logits = apply_fn(variables, x, train=False)
        masks = fused_upsample_argmax(logits, (img, img), align_corners=True)
        return masks, (masks[0, 0, 0] * 0).astype(jnp.uint8)

    tok = jnp.zeros((), jnp.uint8)
    masks, tok0 = serve(state.params, state.batch_stats, images, tok)
    int(masks[0, 0, 0])
    holder = {"tok": tok0}

    def run(n=8):
        tok = holder["tok"]
        t0 = time.perf_counter()
        for _ in range(n):
            masks, tok = serve(state.params, state.batch_stats, images, tok)
        int(tok)
        holder["tok"] = tok
        return (time.perf_counter() - t0) / n * 1e3
    return run


def main():
    setup_runtime()
    assert jax.devices()[0].platform == "tpu"
    key = jax.random.PRNGKey(2)
    images = jax.random.randint(key, (B, H, H, 3), 0, 255, jnp.uint8)
    segs = jnp.zeros((B, H, H), jnp.uint8)

    import optax
    from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                       make_train_step)
    from pytorch_segmentation_tpu.models import DeepLabV3Plus
    from pytorch_segmentation_tpu.ops.loss import make_loss_fn
    model = DeepLabV3Plus(num_classes=21, dtype=jnp.bfloat16,
                          full_res_output=False)
    tx = optax.sgd(1e-3, momentum=0.9)
    step = make_train_step(loss_fn=make_loss_fn(align_corners=True,
                                                use_pallas=True),
                           accumulate=1)
    keys = [jax.random.fold_in(key, i) for i in range(8)]
    jax.block_until_ready(keys)

    def fresh():
        return create_train_state(model, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 64, 64, 3), jnp.float32),
                                  tx)

    runners = {}
    for tag, (kw, feed) in ROUND_CFGS.items():
        runners[f"policy {tag}"] = _mk_policy(kw, images, segs)
        runners[f"e2e    {tag}"] = _mk_e2e(kw, feed, step, fresh(), images,
                                           segs, keys)
    # train/serving/int8: code unchanged r04 -> r05 — one shared runner
    # measured in the same interleaved windows (see module docstring)
    runners["train  r04=r05"] = _mk_train(step, fresh(), B, H)
    runners["serve  r04=r05"] = _mk_serving(fresh(), B, H)
    runners["int8   r04=r05"] = _mk_serving(fresh(), B, H, int8=True)

    results = {k: [] for k in runners}
    for r in range(3):
        for label, run in runners.items():
            ms = run()
            results[label].append(ms)
            print(f"{label} r{r}: {ms:7.1f} ms/batch "
                  f"({B / ms * 1e3:6.1f} img/s)", flush=True)
    print("\n-- medians (interleaved, one process) --")
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    out = {"bs": B, "img": H, "medians_ms": {}, "ratios": {}}
    for k, v in med.items():
        print(f"{k}: {v:7.1f} ms/batch ({B / v * 1e3:6.1f} img/s)")
        out["medians_ms"][k.strip()] = round(v, 2)
    for kind in ("policy", "e2e   "):
        for a_tag, b_tag in (("r03", "r04"), ("r04", "r05"), ("r03", "r05")):
            a, b = med.get(f"{kind} {a_tag}"), med.get(f"{kind} {b_tag}")
            if a and b:
                lbl = f"{kind.strip()} {b_tag} vs {a_tag}"
                print(f"{lbl}: {a / b:.3f}x")
                out["ratios"][lbl] = round(a / b, 3)
    with open("BENCH_REGRESS.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
