#!/usr/bin/env python3
"""TPU cost of the on-device CutMix / Mosaic batch mixes (data/mix.py,
train.py --cutmix/--mosaic): mix-only ms/batch at 32x513^2, and the mix
composed with the default augmentation policy (the production PostFetch
order: mix FIRST, then the per-image policy).

Sync rule (CLAUDE.md): chain reps inside one jit via a loop-carried
scalar that depends on every output; read one scalar at the end.
"""

import time

import jax
import jax.numpy as jnp

from pytorch_segmentation_tpu.data.augment import (AugmentConfig,
                                                   make_augment_fn)
from pytorch_segmentation_tpu.data.mix import make_mix_fn
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

B, H, W = 32, 513, 513
REPS = 10


def bench(fn, label, images, segs):
    @jax.jit
    def many(images, segs):
        def body(c, i):
            rng = jax.random.fold_in(jax.random.PRNGKey(0), i + c)
            out_i, out_s = fn(rng, images, segs)
            tot = (jnp.sum(out_i) * 1e-9).astype(jnp.int32) + jnp.max(out_s)
            return tot % 5, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                            jnp.arange(REPS))
        return c

    _ = int(many(images, segs))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = int(many(images, segs))
        best = min(best, (time.perf_counter() - t0) / REPS * 1e3)
    print(f"[{label:28s}] {best:7.2f} ms/batch ({B / best * 1e3:6.1f} img/s)",
          flush=True)
    return best


def main():
    setup_runtime()
    images = jax.random.randint(jax.random.PRNGKey(1), (B, H, W, 3),
                                0, 255, jnp.uint8)
    segs = jax.random.randint(jax.random.PRNGKey(2), (B, H, W),
                              0, 21, jnp.uint8)
    aug = make_augment_fn(AugmentConfig())

    def composed(mix):
        def fn(rng, i, s):
            i2, s2 = mix(jax.random.fold_in(rng, 1), i, s)
            return aug(jax.random.fold_in(rng, 2), i2, s2)
        return fn

    base = bench(aug, "policy only", images, segs)
    for name, p_cm, p_mo in (("cutmix p=0.5", 0.5, 0.0),
                             ("mosaic p=0.5", 0.0, 0.5),
                             ("cutmix+mosaic p=0.5", 0.5, 0.5)):
        mix = make_mix_fn(p_cm, p_mo)
        only = bench(mix, f"{name} (mix only)", images, segs)
        both = bench(composed(mix), f"{name} + policy", images, segs)
        print(f"  -> overhead vs policy: {both / base:.3f}x "
              f"(mix alone {only:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
