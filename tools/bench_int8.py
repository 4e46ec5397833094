#!/usr/bin/env python3
"""Is int8 2x bf16 on this chip's MXU — and does it survive real conv
shapes? Decides whether an int8 PTQ serving path is worth building.

v5e datasheet peak: 197 bf16 TFLOP/s vs 394 int8 TOP/s. That 2x only
matters if (a) XLA actually lowers int8 `dot`/`conv_general_dilated`
(preferred_element_type=int32) onto the int8 MXU path, and (b) the
serving-relevant conv shapes are MXU-bound rather than on the small-shape
time floor (PERF.md: layer1-class ops are floor-bound — int8 cannot help
those). Probes, chained in-jit with full-result coupling (bench_peak.py
DCE rules):

  - 8192^3 matmul: bf16 vs int8 (peak ratio)
  - DLV3+ serving conv shapes at bs32: ASPP dilated 3x3 2048->256 @33^2,
    layer3-ish 1x1 1024->256 @33^2, layer1 3x3 64->64 @129^2 (floor
    control — expect no int8 win)

All timings interleaved per shape in one process (time-shared chip).
"""
import time

import jax
import jax.numpy as jnp
from jax import lax

from pytorch_segmentation_tpu.utils.runtime import setup_runtime

REPS = 20


def timed(many, *args):
    c = many(*args)
    float(c)
    t0 = time.perf_counter()
    c = many(*args)
    float(c)
    return (time.perf_counter() - t0) / REPS


@jax.jit
def mm_many(a, b):
    def body(c, _):
        a2 = a + c.astype(a.dtype)  # serialize iterations
        y = jnp.dot(a2, b, preferred_element_type=jnp.float32
                    if a.dtype == jnp.bfloat16 else jnp.int32)
        return jnp.sum(y.astype(jnp.float32)) * 1e-12, None
    c, _ = lax.scan(body, jnp.zeros((), jnp.float32), None, length=REPS)
    return c


def conv_many(dilation):
    @jax.jit
    def f(x, w):
        acc = jnp.int32 if x.dtype == jnp.int8 else jnp.float32

        def body(c, _):
            x2 = x + c.astype(x.dtype)
            y = lax.conv_general_dilated(
                x2, w, (1, 1), "SAME", rhs_dilation=(dilation, dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc)
            return jnp.sum(y.astype(jnp.float32)) * 1e-9, None
        c, _ = lax.scan(body, jnp.zeros((), jnp.float32), None, length=REPS)
        return c
    return f


def rnd(key, shape, dt):
    if dt == jnp.int8:
        return jax.random.randint(key, shape, -127, 127, jnp.int8)
    return jax.random.normal(key, shape, dt)


def main():
    setup_runtime()
    print("devices:", jax.devices(), flush=True)
    k = jax.random.PRNGKey(0)

    n = 8192
    rates = {}
    for dt in (jnp.bfloat16, jnp.int8):
        a, b = rnd(k, (n, n), dt), rnd(k, (n, n), dt)
        try:
            t = timed(mm_many, a, b)
        except Exception as e:
            print(f"matmul {jnp.dtype(dt).name} FAILED: {e}"[:300],
                  flush=True)
            continue
        rates[dt] = 2 * n ** 3 / t / 1e12
        print(f"matmul {jnp.dtype(dt).name} {n}^3: {t*1e3:.2f} ms -> "
              f"{rates[dt]:.1f} T(FL)OP/s", flush=True)
    if jnp.int8 in rates and jnp.bfloat16 in rates:
        print(f"peak int8/bf16 ratio: {rates[jnp.int8]/rates[jnp.bfloat16]:.2f}x",
              flush=True)

    shapes = [  # (name, x-shape, w-shape, dilation)
        ("ASPP d6 3x3 2048->256 @33^2", (32, 33, 33, 2048),
         (3, 3, 2048, 256), 6),
        ("1x1 1024->256 @33^2", (32, 33, 33, 1024), (1, 1, 1024, 256), 1),
        ("layer1 3x3 64->64 @129^2 (floor ctl)", (32, 129, 129, 64),
         (3, 3, 64, 64), 1),
    ]
    for name, xs, ws, dil in shapes:
        f = conv_many(dil)
        flops = (2 * xs[0] * xs[1] * xs[2] * ws[0] * ws[1] * ws[2] * ws[3])
        res = {}
        for dt in (jnp.bfloat16, jnp.int8):
            x, w = rnd(k, xs, dt), rnd(jax.random.PRNGKey(1), ws, dt)
            try:
                res[dt] = timed(f, x, w)
            except Exception as e:
                print(f"conv {name} {jnp.dtype(dt).name} FAILED: "
                      f"{e}"[:300], flush=True)
        for dt, t in res.items():
            print(f"conv {name} {jnp.dtype(dt).name}: {t*1e3:.2f} ms -> "
                  f"{flops/t/1e12:.1f} T(FL)OP/s", flush=True)
        if len(res) == 2:
            print(f"  int8 speedup: "
                  f"{res[jnp.bfloat16]/res[jnp.int8]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
