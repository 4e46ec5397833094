#!/usr/bin/env python3
"""Per-op decomposition of the photometric pool (round 5).

The u8 carry bought only ~1 ms (51.4 vs 52.2 ms policy) — the pool is
NOT carry-bandwidth bound, so the round-4 "~1.2 ms/iteration
read+write+switch floor" story is incomplete.  This measures, in ONE
process (drift rule):

  floor:   _PHOTO_OPS replaced by 13 identities — the pure
           scan+switch+carry+gate-where structural cost;
  op=NAME: _PHOTO_OPS replaced by 13 copies of one real op — its
           marginal cost is (t - floor)/13.

Everything else in the policy (warp, fields, gates) is identical across
rows, so differences isolate the pool.
"""

import time

import jax
import jax.numpy as jnp

from pytorch_segmentation_tpu.data import augment as A
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

B, H, W = 32, 513, 513


def bench(label, images, segs, reps=10):
    fn = A.make_augment_fn(A.AugmentConfig())

    @jax.jit
    def many(images, segs):
        def body(c, i):
            rng = jax.random.fold_in(jax.random.PRNGKey(0), i + c)
            out_i, out_s = fn(rng, images, segs)
            tot = (jnp.sum(out_i) * 1e-9).astype(jnp.int32) + jnp.max(out_s)
            return tot % 5, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                            jnp.arange(reps))
        return c

    _ = int(many(images, segs))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = int(many(images, segs))
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    print(f"pool [{label:16s}]: {best:7.1f} ms/batch", flush=True)
    return best


def main():
    import sys
    setup_runtime()
    assert jax.devices()[0].platform == "tpu"
    key = jax.random.PRNGKey(2)
    images = jax.random.randint(key, (B, H, W, 3), 0, 255, jnp.uint8)
    segs = jnp.zeros((B, H, W), jnp.uint8)

    names = [op.__name__ for op in A._PHOTO_OPS]
    real_ops = list(A._PHOTO_OPS)
    ident = lambda k, x, cfg: x

    rows = {}
    rows["default"] = bench("default", images, segs)
    A._PHOTO_OPS = [ident] * 13
    rows["floor"] = bench("floor (13 ident)", images, segs)
    want = sys.argv[1:] if len(sys.argv) > 1 else names
    for i, (name, op) in enumerate(zip(names, real_ops)):
        if not any(w in name for w in want):
            continue
        A._PHOTO_OPS = [op] * 13
        rows[name] = bench(name, images, segs)
    A._PHOTO_OPS = real_ops

    floor = rows["floor"]
    print(f"\nfloor {floor:.1f} ms; per-op marginal (t-floor)/13:")
    for name, t in rows.items():
        if name in ("default", "floor"):
            continue
        print(f"  {name:20s}: {(t - floor) / 13:6.2f} ms/application")
    print(f"default policy: {rows['default']:.1f} ms")


if __name__ == "__main__":
    main()
