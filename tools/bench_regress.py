"""Drift-proof cross-round perf comparison (VERDICT r3 next #7).

The tunneled chip's absolute throughput drifts ~60% between processes
(CLAUDE.md), so cross-round BENCH claims must never compare two
single-process snapshots. This tool reconstructs each round's DEFAULT
configuration in ONE process and interleaves timed rounds of all
variants (tools/bench_ab.py protocol), reporting medians and ratios.

Round configs are code-level flags, so "r03 vs r04" is exact as long as
the flagged code paths survive; when a default flips, add the old
setting here. Usage:

    python tools/bench_regress.py            # augment policy + e2e
"""

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

# each round's DEFAULT augmentation configuration (the train step itself
# is unchanged r03 -> r04, so augment policy + e2e are the moving parts)
ROUND_CFGS = {
    "r03": dict(banded_warp=False, separable_warp=False, photo_bf16=False),
    "r04": dict(),  # banded warp + bf16 photometric carry defaults
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


def _mk_e2e(cfg_kw, step, state, images, segs, keys):
    aug = make_augment_fn(AugmentConfig(**cfg_kw))

    @jax.jit
    def prep(rng, images, segs):
        im, sg = aug(rng, images, segs)
        return normalize_images(im, jnp.float32), sg

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

    runners = {}
    for tag, kw in ROUND_CFGS.items():
        runners[f"policy {tag}"] = _mk_policy(kw, images, segs)
        st = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3), jnp.float32), tx)
        runners[f"e2e    {tag}"] = _mk_e2e(kw, step, st, images, segs, keys)

    results = {k: [] for k in runners}
    for r in range(3):
        for label, run in runners.items():
            ms = run()
            results[label].append(ms)
            print(f"{label} r{r}: {ms:7.1f} ms/batch "
                  f"({B / ms * 1e3:6.1f} img/s)", flush=True)
    print("\n-- medians (interleaved, one process) --")
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    for k, v in med.items():
        print(f"{k}: {v:7.1f} ms/batch ({B / v * 1e3:6.1f} img/s)")
    for kind in ("policy", "e2e   "):
        a, b = med.get(f"{kind} r03"), med.get(f"{kind} r04")
        if a and b:
            print(f"{kind} r04 vs r03: {a / b:.3f}x")


if __name__ == "__main__":
    main()
