#!/usr/bin/env python3
"""Prototype benchmark: two-pass (separable) lane-gather warp vs the
current batch-global flat-gather samplers (VERDICT r3 item #5).

Structure under test (coordinates are random stand-ins; only gather/eltwise
cost matters here):
  pass 1 (vertical):  transpose packed u32 -> lane-gather 2 taps -> lerp
                      -> repack u8 -> transpose back
  pass 2 (horizontal): lane-gather 2 taps -> lerp -> unpack outputs
vs the current samplers: 1 global gather (nearest/stochastic default) and
4 global gathers (exact 4-tap bilinear).

Run on TPU: PYTHONPATH=/root/repo python tools/bench_twopass.py
"""

import time

import jax
import jax.numpy as jnp

from pytorch_segmentation_tpu.data.augment import (_pack_u32, _unpack_rgb,
                                                   _sample_nearest_packed,
                                                   _sample_packed)
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

REPS = 8
B, N = 32, 513


def timed(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    s = float(jnp.sum(out[0][:, ::97, ::97].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    s = float(jnp.sum(out[0][:, ::97, ::97].astype(jnp.float32)))  # sync
    return (time.perf_counter() - t0) / REPS, s


def _lane_taps(arr, idx):
    """2-tap lane gather of packed u32 [B, R, C] at f32 coords [B, R, C]
    along the last axis; returns (g0, g1, frac)."""
    c = arr.shape[-1]
    i0 = jnp.clip(jnp.floor(idx), 0, c - 1)
    frac = idx - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, c - 1)
    g0 = jnp.take_along_axis(arr, i0, axis=2, mode="promise_in_bounds")
    g1 = jnp.take_along_axis(arr, i1, axis=2, mode="promise_in_bounds")
    return g0, g1, frac


def _lerp_repack(g0, g1, frac):
    """Vertical-pass output: lerp RGB, nearest mask, repacked to u32."""
    w = frac[..., None]
    rgb = _unpack_rgb(g0) * (1 - w) + _unpack_rgb(g1) * w
    rgb_u = jnp.clip(rgb + 0.5, 0, 255).astype(jnp.uint32)
    near = jnp.where(frac >= 0.5, g1, g0)
    seg = near >> 24
    return (rgb_u[..., 0] | (rgb_u[..., 1] << 8) | (rgb_u[..., 2] << 16)
            | (seg << 24))


@jax.jit
def two_pass(imgs_u8, segs_u8, vcoord, hcoord):
    """vcoord: [B, N, N] vertical source row per (intermediate col, out row)
    in TRANSPOSED layout; hcoord: [B, N, N] horizontal source col per
    output pixel."""
    packed = _pack_u32(imgs_u8, segs_u8)
    pt = jnp.swapaxes(packed, 1, 2)              # [B, W, H]
    g0, g1, f = _lane_taps(pt, vcoord)           # vertical resample
    t = jnp.swapaxes(_lerp_repack(g0, g1, f), 1, 2)   # [B, H, W]
    g0, g1, f = _lane_taps(t, hcoord)            # horizontal resample
    w = f[..., None]
    img = _unpack_rgb(g0) * (1 - w) + _unpack_rgb(g1) * w
    seg = jnp.where(f >= 0.5, g1, g0) >> 24
    return img, seg.astype(jnp.int32)


@jax.jit
def one_gather(imgs_u8, segs_u8, sy, sx):
    mode = jnp.zeros((B,), jnp.int32)
    cval = jnp.zeros((B,), jnp.float32)
    return _sample_nearest_packed(imgs_u8, segs_u8, sy, sx, mode, cval)


@jax.jit
def four_gather(imgs_u8, segs_u8, sy, sx):
    mode = jnp.zeros((B,), jnp.int32)
    cval = jnp.zeros((B,), jnp.float32)
    return _sample_packed(imgs_u8, segs_u8, sy, sx, mode, cval,
                          jnp.ones((B,), bool))


def main():
    setup_runtime()
    print("devices:", jax.devices(), flush=True)
    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    imgs = jax.random.randint(k1, (B, N, N, 3), 0, 256, jnp.uint8)
    segs = jax.random.randint(k2, (B, N, N), 0, 21, jnp.uint8)
    coords = jax.random.uniform(k3, (2, B, N, N), minval=0.0,
                                maxval=N - 1.0)
    sy, sx = coords[0], coords[1]

    dt, s = timed(one_gather, imgs, segs, sy, sx)
    print(f"current 1-gather nearest:   {dt * 1e3:7.1f} ms/batch ({s:.0f})",
          flush=True)
    dt, s = timed(four_gather, imgs, segs, sy, sx)
    print(f"current 4-gather bilinear:  {dt * 1e3:7.1f} ms/batch ({s:.0f})",
          flush=True)
    dt, s = timed(two_pass, imgs, segs, sy, sx)
    print(f"two-pass 4-lane-tap warp:   {dt * 1e3:7.1f} ms/batch ({s:.0f})",
          flush=True)


@jax.jit
def bare_lane_gather(imgs_u8, segs_u8, sy, sx):
    """Sanity: single lane-tap on packed u32 — should be ~12.6 ms/batch
    (1.5 ns/elem, tools/bench_gather.py)."""
    packed = _pack_u32(imgs_u8, segs_u8)
    xi = jnp.clip(sx, 0, packed.shape[-1] - 1).astype(jnp.int32)
    g = jnp.take_along_axis(packed, xi, axis=2, mode="promise_in_bounds")
    return _unpack_rgb(g), (g >> 24).astype(jnp.int32)


@jax.jit
def two_pass_barrier(imgs_u8, segs_u8, vcoord, hcoord):
    """Two-pass with optimization barriers after transpose/select so the
    gathers read a MATERIALIZED contiguous array (XLA operand-fusing the
    transpose into the gather would make every 'lane' tap stride across
    sublanes)."""
    packed = _pack_u32(imgs_u8, segs_u8)
    pt = jax.lax.optimization_barrier(jnp.swapaxes(packed, 1, 2))
    g0, g1, f = _lane_taps(pt, vcoord)
    t = jax.lax.optimization_barrier(
        jnp.swapaxes(_lerp_repack(g0, g1, f), 1, 2))
    g0, g1, f = _lane_taps(t, hcoord)
    w = f[..., None]
    img = _unpack_rgb(g0) * (1 - w) + _unpack_rgb(g1) * w
    seg = jnp.where(f >= 0.5, g1, g0) >> 24
    return img, seg.astype(jnp.int32)


@jax.jit
def pass_only(imgs_u8, segs_u8, vcoord, hcoord):
    """One 2-tap pass, no transpose: isolates the tap cost."""
    packed = _pack_u32(imgs_u8, segs_u8)
    g0, g1, f = _lane_taps(packed, hcoord)
    w = f[..., None]
    img = _unpack_rgb(g0) * (1 - w) + _unpack_rgb(g1) * w
    seg = jnp.where(f >= 0.5, g1, g0) >> 24
    return img, seg.astype(jnp.int32)


@jax.jit
def transpose_only(imgs_u8, segs_u8, vcoord, hcoord):
    packed = _pack_u32(imgs_u8, segs_u8)
    t = jnp.swapaxes(packed, 1, 2)
    return (t & 0xFF).astype(jnp.float32), (t >> 24).astype(jnp.int32)


def variants():
    setup_runtime()
    print("devices:", jax.devices(), flush=True)
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    imgs = jax.random.randint(k1, (B, N, N, 3), 0, 256, jnp.uint8)
    segs = jax.random.randint(k2, (B, N, N), 0, 21, jnp.uint8)
    coords = jax.random.uniform(k3, (2, B, N, N), minval=0.0,
                                maxval=N - 1.0)
    sy, sx = coords[0], coords[1]
    for fn, name in ((bare_lane_gather, "bare 1-tap lane gather"),
                     (pass_only, "one 2-tap pass, no transpose"),
                     (transpose_only, "transpose only"),
                     (two_pass_barrier, "two-pass + opt barriers"),
                     (two_pass, "two-pass (fused transpose)")):
        dt, s = timed(fn, imgs, segs, sy, sx)
        print(f"{name:32s} {dt * 1e3:7.1f} ms/batch ({s:.0f})", flush=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "v":
        variants()
    else:
        main()
