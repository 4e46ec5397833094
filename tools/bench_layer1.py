#!/usr/bin/env python3
"""Layer1-backward roofline probe (VERDICT r3 item #4).

The corrected step profile (PERF.md round 2) puts DLV3+ layer1 at 28.7 ms
of the 129.6 ms step with its backward at ~23 TFLOP/s vs the 122 TFLOP/s
8192^3 calibration. Is that XLA scheduling badly, or the SHAPE roofline of
small-channel (64-lane) convs? This tool measures, in isolation (chained
in-jit, data as args, full-result dependency — bench_peak.py protocol):

  1. the exact dominant backward matmul/conv shapes of layer1
     (dW tall-skinny contractions, dx small-N convs),
  2. the same shapes with channels padded 64 -> 128 (lane-width effect),
  3. the full 3-bottleneck layer1 forward+backward (incl. BN) as jax.grad,

so "shape roofline" vs "fusion/packing problem" is decided by numbers.
Shapes: DLV3+ @513^2 bs32 -> layer1 spatial 129^2, K = 32*129*129 = 532512.
"""

import time

import jax
import jax.numpy as jnp

from pytorch_segmentation_tpu.utils.runtime import setup_runtime

REPS = 10
K = 32 * 129 * 129


def timed(fn, *args):
    c = fn(*args)
    float(c)
    t0 = time.perf_counter()
    c = fn(*args)
    float(c)
    return (time.perf_counter() - t0) / REPS


def chain(op):
    """Chain REPS dependent iterations of op(a, b) inside one jit."""

    @jax.jit
    def many(a, b):
        def body(c, _):
            a2 = a + c.astype(a.dtype)
            y = op(a2, b)
            return jnp.sum(y.astype(jnp.float32)) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=REPS)
        return c

    return many


def bench_dot(name, m, n, k, dtype=jnp.bfloat16):
    """y[m,n] = a[k,m]^T @ b[k,n] — the dW contraction layout."""
    a = jax.random.normal(jax.random.PRNGKey(0), (k, m), dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), dtype)
    op = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dt = timed(chain(op), a, b)
    fl = 2 * m * n * k
    print(f"{name:28s} [{k}x{m}]^T@[{k}x{n}]: {dt * 1e3:7.2f} ms  "
          f"{fl / dt / 1e12:6.1f} TFLOP/s", flush=True)


def bench_mm(name, m, n, k, dtype=jnp.bfloat16):
    """y[m,n] = a[m,k] @ b[k,n] — the dx 1x1 layout."""
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), dtype)
    op = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    dt = timed(chain(op), a, b)
    fl = 2 * m * n * k
    print(f"{name:28s} [{m}x{k}]@[{k}x{n}]: {dt * 1e3:7.2f} ms  "
          f"{fl / dt / 1e12:6.1f} TFLOP/s", flush=True)


def bench_conv(name, ci, co, hw=129, ksize=3, dtype=jnp.bfloat16):
    x = jax.random.normal(jax.random.PRNGKey(0), (32, hw, hw, ci), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (ksize, ksize, ci, co),
                          dtype)
    op = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    dt = timed(chain(op), x, w)
    fl = 2 * 32 * hw * hw * ksize * ksize * ci * co
    print(f"{name:28s} conv{ksize}x{ksize} {ci}->{co} @{hw}^2: "
          f"{dt * 1e3:7.2f} ms  {fl / dt / 1e12:6.1f} TFLOP/s", flush=True)


def bench_layer1_grad():
    """Full layer1 (3 bottlenecks) fwd+bwd incl. train-mode BN."""
    from pytorch_segmentation_tpu.nn.backbones.resnet import Bottleneck
    from flax import linen as nn

    class L1(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            for b in range(3):
                x = Bottleneck(64, downsample=(b == 0),
                               dtype=jnp.bfloat16,
                               name=f"b{b}")(x, train=train)
            return x

    model = L1()
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 129, 129, 64),
                          jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x[:1], train=False)

    def loss(params, bs, x):
        y, mut = model.apply({"params": params, "batch_stats": bs}, x,
                             train=True, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32)) * 1e-6, mut

    @jax.jit
    def many(params, bs, x):
        def body(c, _):
            (l, _), grads = jax.value_and_grad(loss, has_aux=True)(
                params, bs, x + c.astype(x.dtype))
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            return (l + gsum) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=REPS)
        return c

    dt = timed(many, variables["params"], variables["batch_stats"], x)
    # fwd flops: block0 73728*2K, blocks1-2 69632*2K each; fwd+bwd ~ 3x
    fl = (73728 + 2 * 69632) * 2 * K * 3
    print(f"{'layer1 fwd+bwd (3 blocks)':28s} {dt * 1e3:7.2f} ms  "
          f"{fl / dt / 1e12:6.1f} TFLOP/s effective", flush=True)


def main():
    setup_runtime()
    print("devices:", jax.devices(), flush=True)

    # dW contractions (X^T @ dY over K = B*H*W)
    bench_dot("dW conv2 3x3 (64->64)", 576, 64, K)
    bench_dot("dW conv3 1x1 (64->256)", 64, 256, K)
    bench_dot("dW conv1 1x1 (256->64)", 256, 64, K)
    bench_dot("dW 3x3 pad N=128", 576, 128, K)
    bench_dot("dW 3x3 half-K ctrl", 576, 64, K // 2)

    # dx matmuls / convs
    bench_mm("dx conv3 (dY@W^T 256->64)", K, 64, 256)
    bench_mm("dx conv1 (dY@W^T 64->256)", K, 256, 64)
    bench_mm("dx pad both 128", K, 128, 128)
    bench_conv("dx conv2 (3x3 64->64)", 64, 64)
    bench_conv("ctrl conv2 128ch", 128, 128)
    bench_conv("fwd conv2 (3x3 64->64)", 64, 64)

    bench_layer1_grad()


if __name__ == "__main__":
    main()
