"""Interpret-mode correctness tests for the banded-matmul resampler.

The CPU suite normally takes banded_resample_rows' `_reference` XLA branch
(platform check), so the kernel body — scalar-prefetch window starts,
block-diag lhs layout, dead-block gating, edge padding of partial tiles —
was previously validated only by on-chip measurements.  These tests run
the Pallas kernel in interpret mode against `_reference` at exact-multiple
AND partial shapes, with coordinates pushed near C-1 (the case where the
old zero-fill coord padding anchored the source window at column 0 and
min-clamped real coordinates on partial edge tiles).

interpret-pass != Mosaic-compiles (CLAUDE.md): tools/bench_banded.py is
still the on-chip proof; this guards the kernel's *math*.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_segmentation_tpu.ops.pallas.banded_resample import (
    _reference,
    banded_resample_rows,
)


def _mk(b, r, w, c, seed, lo, hi, scale=1.0):
    """Random planes + affine-ish per-row coords spanning [lo, hi]."""
    rng = np.random.default_rng(seed)
    planes = rng.uniform(0, 255, size=(b, 4, r, c)).astype(np.float32)
    planes[:, 3] = rng.integers(0, 21, size=(b, r, c))  # seg ids
    # per-row affine coords: x -> lo + a*x (+ jitter), in-distribution band
    a = (hi - lo) / max(w - 1, 1) * scale
    base = lo + a * np.arange(w, dtype=np.float32)
    coords = base[None, None, :] + rng.uniform(
        -0.45, 0.45, size=(b, r, w)).astype(np.float32)
    coords = np.clip(coords, 0.0, c - 1.0)
    # avoid exact .5 ties (nearest-tap rounding ambiguity vs floor(c+.5))
    frac = coords - np.floor(coords)
    coords = np.where(np.abs(frac - 0.5) < 1e-3, coords + 2e-3, coords)
    use_bil = np.arange(b) % 2 == 0
    return (jnp.asarray(planes, jnp.bfloat16), jnp.asarray(coords),
            jnp.asarray(use_bil))


def _run_both(planes, coords, use_bil):
    got = banded_resample_rows(planes, coords, use_bil, interpret=True)
    want = _reference(planes, coords, use_bil)
    return np.asarray(got), np.asarray(want)


@pytest.mark.parametrize(
    "r,w,c,lo,hi",
    [
        (16, 128, 512, 10.0, 140.0),      # exact multiples, small span
        (16, 128, 512, 300.0, 430.0),     # window start deep in the input
        (18, 130, 513, 0.0, 120.0),       # partial R/W/C tiles, low coords
    ],
)
def test_matches_reference(r, w, c, lo, hi):
    planes, coords, use_bil = _mk(2, r, w, c, seed=r + w, lo=lo, hi=hi)
    got, want = _run_both(planes, coords, use_bil)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3)


def test_partial_edge_tiles_near_c_minus_1():
    """The zero-pad regression case: partial tiles with coords near C-1.

    With zero-filled coord padding the padded entries dragged the tile's
    cmin to 0, the window anchored at column 0, and real coords above
    (0+4)*128-1.5 were min-clamped — edge columns sampled ~1.5px (or
    worse) off.  Edge-replicated padding keeps window selection driven by
    real coordinates only; the kernel must match the dense reference.
    """
    r, w, c = 18, 130, 513
    planes, coords, use_bil = _mk(2, r, w, c, seed=7, lo=c - 1 - 120.0,
                                  hi=c - 1.0)
    assert float(jnp.max(coords)) > 510.5  # actually exercises the clamp
    got, want = _run_both(planes, coords, use_bil)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3)


def test_nonsquare_wide_input():
    """Wide non-square input (bench_banded's 520x640 class): the final
    partial row-block used to clamp coords by >100px under zero-fill."""
    r, w, c = 20, 160, 640
    planes, coords, use_bil = _mk(1, r, w, c, seed=3, lo=c - 1 - 150.0,
                                  hi=c - 1.0)
    got, want = _run_both(planes, coords, use_bil)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3)


def test_seg_plane_nearest_exact_ids():
    """Plane 3 must hold exact integer ids from the input (pure nearest)."""
    planes, coords, use_bil = _mk(2, 16, 128, 512, seed=11, lo=200.0,
                                  hi=330.0)
    got, _ = _run_both(planes, coords, use_bil)
    seg = got[:, 3]
    np.testing.assert_array_equal(seg, np.round(seg))
    assert seg.min() >= 0 and seg.max() <= 20
