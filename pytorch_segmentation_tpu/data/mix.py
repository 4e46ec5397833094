"""On-device batch-mixing augmentations: CutMix and 4-image Mosaic.

Beyond the reference (its imgaug policy is strictly per-image —
utils/datasets.py:86-131); these are the standard batch-level mixes used
by modern segmentation recipes. Both are pure index/select ops designed
for the TPU batch pipeline:

- They run INSIDE the jitted PostFetch program (data/pipeline.py) on the
  uint8 batch before the geometric/photometric policy, so they add zero
  extra host dispatches and the mixed canvas is then augmented as one
  image (the conventional order).
- Donors come from `jnp.roll` over the batch axis — a free layout view
  for XLA — never a per-pixel cross-batch gather. CutMix reads 2
  candidates per pixel, Mosaic 4; both are a handful of vectorized
  selects at HBM bandwidth (~the cost of one extra elementwise pass).
- Labels are spatial, so the seg maps swap under the SAME masks —
  no label smoothing/interpolation ambiguity like classification mixup
  (which is deliberately NOT offered: averaging class-index maps is
  meaningless).
- Static shapes throughout: the random box/center only changes VALUES
  (coordinate comparisons), never shapes, so one compiled program serves
  every batch.

CutMix (Yun et al., ICCV 2019): per sample, with prob `p`, a random
rectangle is replaced by the same rectangle from the next sample in the
batch. lam ~ U(0,1); the box has side fractions sqrt(1-lam) (the paper's
exact combination ratio), clipped at the canvas like the official impl.

Mosaic (YOLO-family; same-scale variant): per sample, with prob `p`,
the canvas is re-stitched from 4 consecutive batch samples around a
random center in [0.25, 0.75]^2 — quadrant q keeps the pixels of donor
q at their original positions (the batch policy's own random
scale/translate/warp then diversifies framing, so no per-tile rescale
is needed — that would force 4 resizes per sample for little
distributional gain).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cutmix", "mosaic", "make_mix_fn"]


def _grids(h: int, w: int):
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]   # [1, H, 1]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]   # [1, 1, W]
    return ys, xs


def cutmix(rng: jax.Array, images: jax.Array, segs: jax.Array, p: float):
    """Per-sample CutMix with the next batch element as donor.

    images [B,H,W,C] (any dtype), segs [B,H,W] int. Returns same
    shapes/dtypes."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    k_gate, k_lam, k_cy, k_cx = jax.random.split(rng, 4)
    gate = jax.random.bernoulli(k_gate, p, (b,))            # [B]
    lam = jax.random.uniform(k_lam, (b,))
    # box half-extent fractions sqrt(1-lam), random center, clipped
    rh = jnp.sqrt(1.0 - lam) * h
    rw = jnp.sqrt(1.0 - lam) * w
    cy = jax.random.uniform(k_cy, (b,)) * h
    cx = jax.random.uniform(k_cx, (b,)) * w
    y0, y1 = jnp.clip(cy - rh / 2, 0, h), jnp.clip(cy + rh / 2, 0, h)
    x0, x1 = jnp.clip(cx - rw / 2, 0, w), jnp.clip(cx + rw / 2, 0, w)
    ys, xs = _grids(h, w)
    inbox = ((ys >= y0[:, None, None]) & (ys < y1[:, None, None]) &
             (xs >= x0[:, None, None]) & (xs < x1[:, None, None]))
    take = inbox & gate[:, None, None]                      # [B,H,W]
    donor_img = jnp.roll(images, -1, axis=0)
    donor_seg = jnp.roll(segs, -1, axis=0)
    images = jnp.where(take[..., None], donor_img, images)
    segs = jnp.where(take, donor_seg, segs)
    return images, segs


def mosaic(rng: jax.Array, images: jax.Array, segs: jax.Array, p: float):
    """Per-sample 4-way mosaic stitch (same-scale) around a random
    center; donors are batch elements i, i+1, i+2, i+3 (wrapping)."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    k_gate, k_cy, k_cx = jax.random.split(rng, 3)
    gate = jax.random.bernoulli(k_gate, p, (b,))[:, None, None]
    cy = h * jax.random.uniform(k_cy, (b, 1, 1), minval=0.25, maxval=0.75)
    cx = w * jax.random.uniform(k_cx, (b, 1, 1), minval=0.25, maxval=0.75)
    ys, xs = _grids(h, w)
    bottom, right = ys >= cy, xs >= cx                      # [B,H,W]

    def stitch(x, spatial_mask_rank):
        # quadrants: TL=self, TR=roll1, BL=roll2, BR=roll3
        r = [x, jnp.roll(x, -1, axis=0), jnp.roll(x, -2, axis=0),
             jnp.roll(x, -3, axis=0)]
        bm, rm, gm = bottom, right, gate
        if spatial_mask_rank == 4:                          # NHWC images
            bm, rm, gm = bm[..., None], rm[..., None], gm[..., None]
        top = jnp.where(rm, r[1], r[0])
        bot = jnp.where(rm, r[3], r[2])
        out = jnp.where(bm, bot, top)
        return jnp.where(gm, out, x)

    return stitch(images, 4), stitch(segs, 3)


def make_mix_fn(cutmix_p: float = 0.0, mosaic_p: float = 0.0):
    """Returns fn(rng, images, segs) -> (images, segs) applying mosaic
    then cutmix (each independently gated per sample), or None if both
    probabilities are zero."""
    if cutmix_p <= 0 and mosaic_p <= 0:
        return None

    def fn(rng, images, segs):
        k_m, k_c = jax.random.split(rng)
        if mosaic_p > 0:
            images, segs = mosaic(k_m, images, segs, mosaic_p)
        if cutmix_p > 0:
            images, segs = cutmix(k_c, images, segs, cutmix_p)
        return images, segs

    return fn
