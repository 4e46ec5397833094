#!/usr/bin/env python3
"""Calibrate this chip: achievable bf16 matmul TFLOP/s and HBM GB/s.

Chained inside one jit (lax.scan carrying a scalar) — per-call timing only
measures the ~33 ms tunnel round-trip (CLAUDE.md). Arrays are passed as jit
ARGUMENTS: closure-captured arrays become embedded constants that the
tunneled runtime ships with every remote_compile request (HTTP 413 above
~64 MB) and that XLA may fold.
"""

import time

import jax
import jax.numpy as jnp

from pytorch_segmentation_tpu.utils.runtime import setup_runtime

REPS = 20


def timed(many, *args):
    c = many(*args)
    float(c)
    t0 = time.perf_counter()
    c = many(*args)
    float(c)
    return (time.perf_counter() - t0) / REPS


def main():
    setup_runtime()
    print("devices:", jax.devices(), flush=True)

    @jax.jit
    def mm_many(a, b):
        def body(c, _):
            a2 = a + c.astype(a.dtype)  # serialize iterations
            y = jnp.dot(a2, b, preferred_element_type=jnp.float32)
            # depend on ALL of y: y[0,0] alone lets XLA slice the dot to
            # one row x one column (measured 677 "TFLOP/s" at 8192^3)
            return jnp.sum(y) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=REPS)
        return c

    for n, dt_name in ((4096, jnp.bfloat16), (8192, jnp.bfloat16),
                       (4096, jnp.float32)):
        a = jax.random.normal(jax.random.PRNGKey(0), (n, n), dt_name)
        b = jax.random.normal(jax.random.PRNGKey(1), (n, n), dt_name)
        dt = timed(mm_many, a, b)
        extra = a.size * a.dtype.itemsize * 2 / dt / 1e9  # a+c pass r+w
        print(f"matmul {a.dtype} {n}^3: {dt * 1e3:.2f} ms/it -> "
              f"{2 * n ** 3 / dt / 1e12:.1f} TFLOP/s "
              f"(incl. {extra:.0f} GB/s coupling pass)", flush=True)

    @jax.jit
    def ew_many(x):
        def body(c, _):
            y = x * jnp.float32(1.0001) + c
            return y[0, 0, 0] * 1e-3, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=REPS)
        return c

    x = jax.random.normal(jax.random.PRNGKey(2), (512, 512, 512),
                          jnp.float32)
    dt = timed(ew_many, x)
    print(f"eltwise f32 {x.size * 4 / 1e6:.0f}MB r+w: {dt * 1e3:.2f} ms -> "
          f"{x.size * 4 * 2 / dt / 1e9:.0f} GB/s", flush=True)

    @jax.jit
    def red_many(x):
        def body(c, _):
            return jnp.sum((x + c.astype(x.dtype)).astype(jnp.float32)) \
                * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=REPS)
        return c

    xb = jax.random.normal(jax.random.PRNGKey(3), (32, 257, 257, 64),
                           jnp.bfloat16)
    dt = timed(red_many, xb)
    print(f"reduce bf16 {xb.size * 2 / 1e6:.0f}MB read: {dt * 1e3:.2f} ms -> "
          f"{xb.size * 2 / dt / 1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
