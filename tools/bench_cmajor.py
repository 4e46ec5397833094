#!/usr/bin/env python3
"""Channels-major hypothesis test for layer1's small-channel matmuls
(VERDICT r3 item #4).

bench_layer1.py showed the 64-output-channel shapes at 0.8-11 TFLOP/s
(lane-padded N=64) while a 128-ch control hits 48. Hypothesis: putting
PIXELS in the lane dim (N = B*H*W huge) and channels in sublanes makes the
same math MXU-friendly:

  pixels-major (XLA today): Y[pix, 64]  = X[pix, 256] @ W[256, 64]
  channels-major:           Y[64, pix]  = W^T[64, 256] @ X[256, pix]

Measures both in XLA and a Pallas channels-major tile loop. If
channels-major >= ~40 TFLOP/s the full layer1 kernel path is worth
building; if not, layer1 is at its shape roofline and gets documented.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_segmentation_tpu.utils.runtime import setup_runtime

REPS = 10
PIX = 32 * 129 * 129  # 532512


def timed(fn, *args):
    c = fn(*args)
    float(c)
    t0 = time.perf_counter()
    c = fn(*args)
    float(c)
    return (time.perf_counter() - t0) / REPS


def chain(op):
    @jax.jit
    def many(a, b):
        def body(c, _):
            b2 = b + c.astype(b.dtype)  # couple via the SMALL operand
            y = op(a, b2)
            return jnp.sum(y.astype(jnp.float32)) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=REPS)
        return c
    return many


def xla_cmajor(ci, co, pix):
    a = jax.random.normal(jax.random.PRNGKey(0), (ci, pix), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (co, ci), jnp.bfloat16)
    op = lambda a, w: jnp.dot(w, a, preferred_element_type=jnp.float32)
    dt = timed(chain(lambda a, w: op(a, w)), a, w)
    fl = 2 * ci * co * pix
    print(f"XLA cmajor W[{co},{ci}]@X[{ci},{pix}]: {dt * 1e3:7.2f} ms "
          f"{fl / dt / 1e12:6.1f} TFLOP/s", flush=True)


def _mm_kernel(w_ref, x_ref, y_ref):
    y_ref[...] = jax.lax.dot_general(
        w_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(y_ref.dtype)


def pallas_cmajor(ci, co, pix, tn=2048):
    a = jax.random.normal(jax.random.PRNGKey(0), (ci, pix), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (co, ci), jnp.bfloat16)
    grid = (pix // tn,)
    op = pl.pallas_call(
        _mm_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((co, ci), lambda i: (0, 0)),
                  pl.BlockSpec((ci, tn), lambda i: (0, i))],
        out_specs=pl.BlockSpec((co, tn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((co, pix), jnp.float32),
    )
    dt = timed(chain(lambda a, w: op(w, a)), a, w)
    fl = 2 * ci * co * pix
    print(f"Pallas cmajor W[{co},{ci}]@X[{ci},{pix}] tn={tn}: "
          f"{dt * 1e3:7.2f} ms {fl / dt / 1e12:6.1f} TFLOP/s", flush=True)


def conv_form(ci, co, ksize=1):
    """What the model actually runs: NHWC conv_general."""
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 129, 129, ci),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (ksize, ksize, ci, co),
                          jnp.bfloat16)
    op = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)

    @jax.jit
    def many(x, w):
        def body(c, _):
            w2 = w + c.astype(w.dtype)
            y = op(x, w2)
            return jnp.sum(y.astype(jnp.float32)) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=REPS)
        return c

    dt = timed(many, x, w)
    fl = 2 * 32 * 129 * 129 * ksize * ksize * ci * co
    print(f"XLA conv{ksize}x{ksize} NHWC {ci}->{co}: {dt * 1e3:7.2f} ms "
          f"{fl / dt / 1e12:6.1f} TFLOP/s", flush=True)


def main():
    setup_runtime()
    print("devices:", jax.devices(), flush=True)
    pix = 32 * 128 * 128  # 524288, divisible by big tiles

    conv_form(256, 64, 1)
    conv_form(64, 256, 1)
    conv_form(64, 64, 3)

    xla_cmajor(256, 64, pix)
    xla_cmajor(64, 256, pix)

    for tn in (1024, 2048, 4096):
        pallas_cmajor(256, 64, pix, tn)
    pallas_cmajor(64, 256, pix, 2048)
    # 3x3 im2col-ish: K=576 fused taps (pure matmul cost model)
    pallas_cmajor(576, 64, pix, 2048)


if __name__ == "__main__":
    main()


def conv_form_v(ci, co, ksize=1, bs=32, dtype=jnp.bfloat16, out_dtype=None):
    """Dtype / batch-size variants of the NHWC conv probe."""
    x = jax.random.normal(jax.random.PRNGKey(0), (bs, 129, 129, ci), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (ksize, ksize, ci, co),
                          dtype)
    op = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype or jnp.float32)

    @jax.jit
    def many(x, w):
        def body(c, _):
            w2 = w + c.astype(w.dtype)
            y = op(x, w2)
            return jnp.sum(y.astype(jnp.float32)) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=REPS)
        return c

    dt = timed(many, x, w)
    fl = 2 * bs * 129 * 129 * ksize * ksize * ci * co
    print(f"conv{ksize}x{ksize} {ci}->{co} bs{bs} {dtype.__name__}"
          f"->{(out_dtype or jnp.float32).__name__}: {dt * 1e3:7.2f} ms "
          f"{fl / dt / 1e12:6.1f} TFLOP/s", flush=True)


def variants():
    setup_runtime()
    print("devices:", jax.devices(), flush=True)
    conv_form_v(64, 64, 3, 32)                          # baseline
    conv_form_v(64, 64, 3, 32, jnp.float32)             # f32 stream test
    conv_form_v(64, 64, 3, 32, out_dtype=jnp.bfloat16)  # bf16 out
    conv_form_v(64, 64, 3, 64)                          # bs64: latency vs BW
    conv_form_v(64, 64, 3, 8)                           # bs8
    conv_form_v(256, 64, 1, 32)
    conv_form_v(256, 64, 1, 64)
