"""Banded-matmul row resampler — the gather-free warp core.

The augmentation warp's cost on TPU is the arbitrary gather: the fastest
measured formulation is 7.3 ns/element (tools/bench_gather.py), which puts
the packed single-tap warp at ~64 ms of the 99 ms/batch default policy and
the exact 4-tap at 263 ms (PERF.md). This kernel removes the gather
entirely: a 1-D resample `out[r, x] = sum_j w(c[r,x] - j) * in[r, j]` is a
matmul against a banded interpolation matrix with <= 2 nonzeros per
column. TPUs can't gather, but they can (a) build that matrix on the fly
in VMEM from an iota comparison (VPU, ~5 ops/entry, and the matrix NEVER
touches HBM) and (b) multiply it on the MXU where the FLOPs are ~free.
All C channels share one matrix build, and exact deterministic bilinear
costs the same as nearest — the two wins the gather formulation can't
have (a packed gather pays per element; 4-tap exactness pays 4x).

Used by data/augment.py's two-pass (Catmull-Smith) warp realization
(reference utils/datasets.py:44-57 Affine + PerspectiveTransform): each
pass resamples the last axis of [B, P, R, C] planes at per-row f32
coordinates. Bilinear weights here are f32-computed, bf16-stored
(2^-8 quantization — finer than cv2's 5-bit fixed-point INTER_LINEAR
weights, reference's imgaug backend).

Band locality: the policy's coordinate maps (inverse affine scale
0.8-1.2, rotation folded to |theta|<=45 deg by the caller's transpose
factoring, shear 16 deg, perspective <=0.1, piecewise-affine <=0.05,
elastic jitter <=3.5 px) bound the source span of 128 consecutive
outputs by ~290 columns; a 4x128 window at a 128-quantized start covers
any span <= 385. Coordinates are clamped into the window by the caller
(a no-op for every in-distribution sample).

Grid: (B, R/16, W/128, KB=4); the KB axis walks the 4 window blocks,
accumulating into an f32 scratch, with the input block index taken from
the scalar-prefetched per-tile window start (PrefetchScalarGridSpec),
and dead window blocks (start past the tile's true span) skipped. Per
step the 16-row x 128-col input window is laid out block-diagonally
([4C*16R, 16*128] lhs) so ONE MXU dot per plane-group covers all 16
rows — plane rows 0..47 (RGB, per-sample bilinear-or-nearest weights,
reference Affine order=[0,1]) and 48..63 (segmentation, always nearest)
contract against their weight variants; nearest-order samples collapse
to a single matrix + dot. Measured 15.3 ms/pass at 32x520x640
(tools/bench_banded.py) vs ~64 ms for the packed gather warp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["banded_resample_rows"]

_ROWS = 16     # rows per grid step
_TILE = 128    # output columns per grid step (lane width)
_KB = 4        # 128-wide input window blocks per tile


def _kernel(starts_ref, ends_ref, ubil_ref, planes_ref, coords_ref,
            out_ref, acc_ref, a_ref, bi_ref, bn_ref, *, nrb, nt):
    b = pl.program_id(0)
    rb = pl.program_id(1)
    t = pl.program_id(2)
    kb = pl.program_id(3)

    # starts/ends are flattened 1-D: a 3-D scalar-prefetch array would
    # be (8, 128)-tiled in SMEM and blow the 1 MB SMEM budget
    lin = (b * nrb + rb) * nt + t
    sb = starts_ref[lin]
    base = (sb + kb) * _TILE                       # window col offset
    u = ubil_ref[b] != 0                           # bilinear image taps?

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # window blocks past the tile's true span contribute nothing — skip
    # the build + dots (typical spans cover 2-3 of the 4 blocks)
    @pl.when(sb + kb <= ends_ref[lin])
    def _():
        c = coords_ref[0]                          # [16, 128] f32 abs cols
        cn = jnp.floor(c + 0.5)                    # nearest-tap coords

        # block-diag lhs: A[(p*8+r), (r'*128+j)] = plane[p, r, j] @ r==r'
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (4 * _ROWS, _TILE), 0) % _ROWS
        pin = planes_ref[0].reshape(4 * _ROWS, _TILE)   # [64, 128]
        for r in range(_ROWS):
            a_ref[:, r * _TILE:(r + 1) * _TILE] = jnp.where(
                rows == r, pin, jnp.bfloat16(0))

        # weight matrices per source row r': [128 j, 128 x] subtiles.
        # Nearest weights use max(1 - d^2, 0): for integer-valued d =
        # cn - pos this is the exact one-hot at 3 VPU ops/entry (the hat
        # form costs 4; an i1 equality hits a Mosaic relayout error).
        pos = (jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0)
               + base).astype(jnp.float32)

        def wnear(r):
            d = cn[r:r + 1, :] - pos
            return jnp.maximum(1.0 - d * d, 0.0).astype(jnp.bfloat16)

        @pl.when(u)
        def _():                                   # bilinear image taps
            for r in range(_ROWS):
                wb = jnp.maximum(1.0 - jnp.abs(c[r:r + 1, :] - pos), 0.0)
                bi_ref[r * _TILE:(r + 1) * _TILE, :] = wb.astype(
                    jnp.bfloat16)
                bn_ref[r * _TILE:(r + 1) * _TILE, :] = wnear(r)
            acc_ref[0:3 * _ROWS, :] += jnp.dot(a_ref[0:3 * _ROWS, :], bi_ref[:],
                                        preferred_element_type=jnp.float32)
            acc_ref[3 * _ROWS:, :] += jnp.dot(a_ref[3 * _ROWS:, :], bn_ref[:],
                                         preferred_element_type=jnp.float32)

        @pl.when(jnp.logical_not(u))
        def _():                                   # nearest: one matrix
            for r in range(_ROWS):
                bn_ref[r * _TILE:(r + 1) * _TILE, :] = wnear(r)
            acc_ref[:] += jnp.dot(a_ref[:], bn_ref[:],
                                  preferred_element_type=jnp.float32)

    @pl.when(kb == _KB - 1)
    def _():
        out_ref[0] = acc_ref[:].reshape(4, _ROWS, _TILE).astype(
            out_ref.dtype)


def _reference(planes, coords, use_bil):
    """XLA mirror of the kernel (dense per-row matrices, weights bf16 like
    the kernel's) — the non-TPU path; memory-infeasible at TPU batch
    shapes but exact at CPU test shapes."""
    c = planes.shape[-1]
    pos = jnp.arange(c, dtype=jnp.float32)
    wb = jnp.maximum(1.0 - jnp.abs(coords[..., None] - pos), 0.0)
    cn = jnp.floor(coords + 0.5)
    wn = jnp.maximum(1.0 - jnp.abs(cn[..., None] - pos), 0.0)
    wi = jnp.where(use_bil[:, None, None, None], wb, wn)
    img = jnp.einsum("brwc,bprc->bprw", wi.astype(jnp.bfloat16),
                     planes[:, :3], preferred_element_type=jnp.float32)
    seg = jnp.einsum("brwc,brc->brw", wn.astype(jnp.bfloat16),
                     planes[:, 3], preferred_element_type=jnp.float32)
    return jnp.concatenate([img, seg[:, None]], 1)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def banded_resample_rows(planes, coords, use_bil, *, interpret=False,
                         out_dtype=jnp.float32):
    """Resample the last axis of `planes` at per-row coordinates.

    planes:  [B, 4, R, C] bf16 — r, g, b, seg-id value planes
    coords:  [B, R, W] f32 source columns, in [0, C-1]
    use_bil: [B] bool — imgaug Affine order draw (True: bilinear image
             taps; False: nearest). Plane 3 (seg) is always nearest.
    Returns [B, 4, R, W] `out_dtype` (seg plane holds exact integer
    values; accumulation is f32 either way — bf16 output halves the
    kernel's HBM write + downstream read traffic and represents u8-range
    values and integer seg ids exactly).
    """
    b, p, r, c = planes.shape
    assert p == 4, planes.shape
    if not interpret and jax.devices()[0].platform != "tpu":
        return _reference(planes, coords, use_bil).astype(out_dtype)
    w = coords.shape[-1]
    rp = -r % _ROWS
    wp = -w % _TILE
    cp = -c % _TILE
    if rp or cp:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, rp), (0, cp)))
    if rp or wp:
        # edge-replicate: zero-fill would drag the per-tile cmin to 0 on
        # partial edge tiles, anchoring the 4-block window at column 0 and
        # min-clamping real coords near C-1 (~1.5px at 513^2, unbounded for
        # wide non-square inputs). Replicated values keep the window-start
        # and hi-clamp reductions driven only by real coordinates.
        coords = jnp.pad(coords, ((0, 0), (0, rp), (0, wp)), mode="edge")
    rr, cc, ww = r + rp, c + cp, w + wp
    nkb = cc // _TILE

    # per-(row-block, tile) window starts, quantized to 128-col blocks;
    # clamp coords into the chosen window (no-op for in-distribution spans)
    ctiles = coords.reshape(b, rr // _ROWS, _ROWS, ww // _TILE, _TILE)
    cmin = jnp.min(ctiles, axis=(2, 4))
    cmax = jnp.max(ctiles, axis=(2, 4))
    sb = jnp.clip(jnp.floor(cmin).astype(jnp.int32) // _TILE,
                  0, max(nkb - _KB, 0))
    # last window block any tap in the tile touches (gates dead blocks)
    eb = jnp.minimum((jnp.ceil(cmax).astype(jnp.int32) + 1) // _TILE,
                     sb + _KB - 1)
    # last in-window tap stays <= window end: the -1.5 margin keeps the
    # bilinear upper tap and the nearest round inside the 4 blocks.  When
    # the window already ends at the input end (sb clamped to nkb-_KB) the
    # margin is unnecessary — coords <= cc-1 tap only in-window columns
    # (the pos = cc upper tap has exactly zero weight) — and WOULD wrongly
    # clamp real edge coords in (end-1.5, end] for wide non-square inputs.
    hi = jnp.where(sb + _KB >= nkb, jnp.float32(cc - 1),
                   (sb + _KB) * _TILE - 1.5)
    coords = jnp.minimum(
        coords, jnp.repeat(jnp.repeat(hi, _ROWS, 1), _TILE, 2)[:, :rr])

    nrb, nt = rr // _ROWS, ww // _TILE
    grid = (b, nrb, nt, _KB)
    out = pl.pallas_call(
        functools.partial(_kernel, nrb=nrb, nt=nt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 4, _ROWS, _TILE),
                    lambda bb, rb, t, kb, starts, ends, ub: (
                        bb, 0, rb, starts[(bb * nrb + rb) * nt + t] + kb)),
                pl.BlockSpec(
                    (1, _ROWS, _TILE),
                    lambda bb, rb, t, kb, starts, ends, ub: (bb, rb, t)),
            ],
            out_specs=pl.BlockSpec(
                (1, 4, _ROWS, _TILE),
                lambda bb, rb, t, kb, starts, ends, ub: (bb, 0, rb, t)),
            scratch_shapes=[
                pltpu.VMEM((4 * _ROWS, _TILE), jnp.float32),
                pltpu.VMEM((4 * _ROWS, _ROWS * _TILE), jnp.bfloat16),
                pltpu.VMEM((_ROWS * _TILE, _TILE), jnp.bfloat16),
                pltpu.VMEM((_ROWS * _TILE, _TILE), jnp.bfloat16),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 4, rr, ww), out_dtype),
        interpret=interpret,
    )(sb.reshape(-1), eb.reshape(-1), use_bil.astype(jnp.int32), planes,
      coords)
    return out[:, :, :r, :w]
