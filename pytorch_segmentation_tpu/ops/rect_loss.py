"""RectLoss — rectangularity prior (TPU-native rebuild of reference
utils/criterions.py:7-56).

The reference computes, per (sample, class), the min-area rotated rectangle
of the LARGEST predicted contour with cv2 (findContours/minAreaRect on the
CPU, a GPU->CPU round-trip inside the loss) and uses the filled rectangle as
a BCE target. On TPU we compute the rotated bounding rectangle analytically
from image moments — no host round-trip, fully vectorized over (B, C):

  1. class mask m = (argmax(logits) == c)
  2. principal axis angle from second central moments:
     theta = 0.5 * atan2(2*mu11, mu20 - mu02)
  3. extents = min/max of mask-pixel projections onto the principal axes
  4. target = pixels whose projections lie within the extents

Deviation (documented): the rectangle covers ALL pixels of the class rather
than only the largest connected component (connected-component labeling is
hostile to SPMD hardware); for the single-instance training regime this loss
was written for (CocoInstance), the two coincide.

Like the reference, targets derive from argmax and carry no gradient; the
loss is BCE-with-logits against the rectangle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rect_targets", "rect_loss"]


def rect_targets(pred: jax.Array, num_classes: int) -> jax.Array:
    """pred: [B, H, W] int argmax labels -> [B, H, W, C] f32 rotated-rect
    filled masks (0 where the class is absent)."""
    b, h, w = pred.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def one(mask):  # mask [H, W] f32 for one (sample, class)
        area = jnp.sum(mask)
        safe = jnp.maximum(area, 1.0)
        cx = jnp.sum(mask * xs) / safe
        cy = jnp.sum(mask * ys) / safe
        dx = xs - cx
        dy = ys - cy
        mu20 = jnp.sum(mask * dx * dx) / safe
        mu02 = jnp.sum(mask * dy * dy) / safe
        mu11 = jnp.sum(mask * dx * dy) / safe
        theta = 0.5 * jnp.arctan2(2.0 * mu11, mu20 - mu02)
        c, s = jnp.cos(theta), jnp.sin(theta)
        u = dx * c + dy * s
        v = -dx * s + dy * c
        big = jnp.float32(1e9)
        umin = jnp.min(jnp.where(mask > 0, u, big))
        umax = jnp.max(jnp.where(mask > 0, u, -big))
        vmin = jnp.min(jnp.where(mask > 0, v, big))
        vmax = jnp.max(jnp.where(mask > 0, v, -big))
        # half-pixel dilation so boundary pixels are inside, like a filled
        # cv2.drawContours of the box
        rect = ((u >= umin - 0.5) & (u <= umax + 0.5)
                & (v >= vmin - 0.5) & (v <= vmax + 0.5))
        return jnp.where(area > 0, rect.astype(jnp.float32),
                         jnp.zeros_like(mask))

    masks = jax.nn.one_hot(pred, num_classes, axis=-1)  # [B, H, W, C]
    per_class = jax.vmap(jax.vmap(one, in_axes=-1, out_axes=-1))(masks)
    return jax.lax.stop_gradient(per_class)


def rect_loss(logits: jax.Array, weight: float = 1.0,
              reduction: str = "mean") -> jax.Array:
    """logits: [B, H, W, C]. BCE-with-logits against the per-class rotated
    rectangles of the current prediction (reference RectLoss.forward)."""
    logits = logits.astype(jnp.float32)
    pred = jnp.argmax(logits, axis=-1)
    targets = rect_targets(pred, logits.shape[-1])
    bce = (jnp.maximum(logits, 0) - logits * targets
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    bce = bce * weight
    if reduction == "none":
        return bce
    if reduction == "sum":
        return jnp.sum(bce)
    return jnp.mean(bce)
