"""Test-time augmentation: flip + multi-scale logit averaging.

The reference has no TTA (its eval is a single forward — test.py:26-46);
this is the standard DeepLab/HRNet evaluation protocol offered as an
extension: run the forward at several input scales (and optionally on the
horizontally flipped batch), resize every logit map back to the base
scale's logit resolution, and average. Averaging logits equals a geometric
mean of the softmaxes — the usual formulation.

TPU-native notes: every scale is a *static* shape (scales are Python
floats at trace time), so the whole multi-scale ensemble is ONE jitted
program — no dynamic shapes, each scaled forward lowers to its own
MXU-tiled convolutions. Scaled sizes snap to multiples of 32, the same
convention as the reference's multi-scale training resize
(utils/datasets.py:209-211) and a hard requirement for UNet's x2-upsample
skip concatenation. Resizes go through ops/resize.py (MXU-matmul
bilinear, exact torch align_corners semantics).
"""

from __future__ import annotations

import jax.numpy as jnp

from .resize import resize_bilinear

__all__ = ["normalize_tta_scales", "snap_scale_size", "tta_logits"]


def snap_scale_size(hw, scale: float, snap: int = 32):
    """(H, W) for `scale`, snapped to multiples of `snap` (min one tile).

    Matches the multi-scale training convention (data/resize_host.py):
    models with x2-upsample skip concats (UNet) require /32-divisible
    inputs; snapping also keeps the scale set small and cache-friendly."""
    h, w = int(hw[0]), int(hw[1])
    return (max(snap, int(round(h * scale / snap)) * snap),
            max(snap, int(round(w * scale / snap)) * snap))


def normalize_tta_scales(scales) -> tuple:
    """CLI/user scale list -> canonical tuple: floats, deduped, without the
    base 1.0 entry (the base forward always runs and defines the output
    resolution). () / None -> () (multi-scale TTA off)."""
    if not scales:
        return ()
    out = []
    for s in scales:
        s = float(s)
        if abs(s - 1.0) < 1e-6 or s <= 0:
            continue
        if s not in out:
            out.append(s)
    return tuple(out)


def tta_logits(fwd, images, scales=(), flip: bool = False,
               align_corners: bool = True):
    """Averaged logits at the BASE forward's resolution and dtype.

    fwd: images [B, H, W, 3] (normalized float) -> logits [B, h, w, C]
    (any fixed stride — deferred-upsample low-res logits compose).
    scales: extra input scales from `normalize_tta_scales` (base 1.0 is
    always included implicitly). flip: average each forward with its
    horizontally-flipped twin (W is axis 2 of both images and logits).

    With scales=() and flip=True this reproduces the original flip-TTA
    expression (logits + flip(fwd(flip(x)))) * 0.5 bit-for-bit — the
    make_eval_step/make_mask_fn contract before multi-scale existed.
    """

    def one(x):
        logits = fwd(x)
        if flip:
            flipped = fwd(jnp.flip(x, axis=2))
            logits = (logits + jnp.flip(flipped, axis=2)) * 0.5
        return logits

    base = one(images)
    scales = normalize_tta_scales(scales)
    if not scales:
        return base
    h, w = int(images.shape[1]), int(images.shape[2])
    sizes = []
    for s in scales:
        hw_s = snap_scale_size((h, w), s)
        if hw_s != (h, w) and hw_s not in sizes:
            sizes.append(hw_s)
    if not sizes:
        return base
    acc = base.astype(jnp.float32)
    out_hw = (base.shape[1], base.shape[2])
    for hw_s in sizes:
        xi = resize_bilinear(images.astype(jnp.float32), hw_s,
                             align_corners=align_corners)
        li = one(xi.astype(images.dtype))
        acc = acc + resize_bilinear(li.astype(jnp.float32), out_hw,
                                    align_corners=align_corners)
    return (acc / (1 + len(sizes))).astype(base.dtype)
