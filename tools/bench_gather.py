#!/usr/bin/env python3
"""Microbench TPU gather formulations for the warp (8.4M elements/batch).

The default-augmentation profile shows ONE packed-gather fusion costing
~102 ms/batch (~12 ns/element). This measures the raw gather rate under
different formulations to find the floor.
"""

import time

import jax
import jax.numpy as jnp

from pytorch_segmentation_tpu.utils.runtime import setup_runtime

B, H, W = 32, 513, 513
REPS = 10


def timed(label, many, *args):
    c = many(*args)
    jax.block_until_ready(c)
    float(jnp.sum(c).astype(jnp.float32)) if hasattr(c, "shape") else None
    t0 = time.perf_counter()
    c = many(*args)
    float(jnp.max(c).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / REPS
    n = B * H * W
    print(f"{label:44s} {dt * 1e3:8.2f} ms/batch  "
          f"{dt / n * 1e9:6.2f} ns/elem", flush=True)


def chain(fn):
    # BOTH index operands must depend on the carry: round 2 coupled only
    # yi, so the lanes-only variant (which ignores yi) was hoisted out of
    # the scan by XLA and "measured" 1.5 ns/elem — the real rate is ~12.5
    # (verified by tools/bench_twopass.py variants; PERF.md round 3)
    @jax.jit
    def many(src, yi, xi):
        def body(c, _):
            out = fn(src, (yi + c) % H, (xi + c) % W)
            return jnp.max(out).astype(jnp.int32) % 3, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                            length=REPS)
        return c
    return many


def main():
    setup_runtime()
    key = jax.random.PRNGKey(0)
    src = jax.random.randint(key, (B, H, W), 0, 2 ** 30, jnp.uint32)
    yi = jax.random.randint(jax.random.PRNGKey(1), (B, H, W), 0, H,
                            jnp.int32)
    xi = jax.random.randint(jax.random.PRNGKey(2), (B, H, W), 0, W,
                            jnp.int32)

    # current form: vmapped 2-D integer indexing
    timed("vmap src[yi, xi] (current)",
          chain(lambda s, y, x: jax.vmap(lambda a, b, c: a[b, c])(s, y, x)),
          src, yi, xi)

    # flat linear take per image
    timed("vmap take(flat, y*W+x)",
          chain(lambda s, y, x: jax.vmap(
              lambda a, b: jnp.take(a.reshape(-1), b.reshape(-1))
              .reshape(H, W))(s, y * W + x)),
          src, yi, xi)

    # flat take, promised in bounds (no clamp/select per element)
    timed("vmap flat .at[lin].get(promise_in_bounds)",
          chain(lambda s, y, x: jax.vmap(
              lambda a, b: a.reshape(-1).at[b.reshape(-1)]
              .get(mode="promise_in_bounds").reshape(H, W))(s, y * W + x)),
          src, yi, xi)

    # whole-batch flat take with global linear indices
    def global_take(s, y, x):
        base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None, None]
        lin = (base + y * W + x).reshape(-1)
        return s.reshape(-1).at[lin].get(
            mode="promise_in_bounds").reshape(B, H, W)
    timed("global flat .at[lin].get(promise)", chain(global_take),
          src, yi, xi)

    # row gather then lane gather (NOT the same math — rate probe only):
    # whole-row dynamic gather along sublanes, then per-element within rows
    def rows_then_lanes(s, y, x):
        rows = jnp.take_along_axis(s, y, axis=1)   # src[b, y[i,j], j]
        return jnp.take_along_axis(rows, x, axis=2)
    timed("take_along_axis sub then lane (rate probe)",
          chain(rows_then_lanes), src, yi, xi)

    # lane-only gather (axis=-1): out[i,j] = src[i, x[i,j]]
    timed("take_along_axis lanes only (rate probe)",
          chain(lambda s, y, x: jnp.take_along_axis(s, x, axis=2)),
          src, yi, xi)

    # sublane-only gather (axis=1): out[i,j] = src[y[i,j], j]
    timed("take_along_axis sublanes only (rate probe)",
          chain(lambda s, y, x: jnp.take_along_axis(s, y, axis=1)),
          src, yi, xi)


if __name__ == "__main__":
    main()
