"""Segmentation losses.

`compute_loss` mirrors the reference's active loss path
(reference: utils/utils.py:17-24): bilinearly upsample logits to the label
resolution with align_corners=True, then mean softmax cross-entropy over all
pixels. Here the upsample rides the MXU (see ops/resize.py) and the
cross-entropy is a numerically stable fused logsumexp that XLA folds into the
surrounding graph; a Pallas kernel variant lives in ops/pallas/softmax_ce.py
for the TPU hot path.

Also provides focal BCE and Lovász-softmax as working equivalents of the
reference's auxiliary criterions (reference: utils/criterions.py — whose
LovaszLoss is dead/broken code; we implement the intended math).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .resize import resize_bilinear

__all__ = [
    "softmax_cross_entropy",
    "weighted_cross_entropy",
    "compute_loss",
    "focal_bce_loss",
    "lovasz_softmax_loss",
    "dice_loss",
    "build_loss",
    "LOSSES",
]


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array,
                          ignore_index: int | None = None) -> jax.Array:
    """Mean CE over pixels. logits [..., C] f-any, labels [...] int."""
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    safe_labels = labels.astype(jnp.int32)
    if ignore_index is not None:
        valid = labels != ignore_index
        safe_labels = jnp.where(valid, safe_labels, 0)
    true_logit = jnp.take_along_axis(
        logits, safe_labels[..., None], axis=-1, mode="clip")[..., 0]
    per_pixel = lse - true_logit
    if ignore_index is not None:
        validf = valid.astype(jnp.float32)
        return jnp.sum(per_pixel * validf) / jnp.maximum(jnp.sum(validf), 1.0)
    return jnp.mean(per_pixel)


def compute_loss(logits: jax.Array, targets: jax.Array,
                 ignore_index: int | None = None,
                 align_corners: bool = True) -> jax.Array:
    """Reference-parity loss (utils/utils.py:17-24).

    logits: [B, h, w, C] at model output resolution.
    targets: [B, H, W] integer class ids at label resolution.
    Upsamples logits to (H, W) (align_corners=True by default, matching the
    reference; models that defer an align_corners=False upsample — HRNet —
    pass False), then mean CE.
    """
    th, tw = targets.shape[1], targets.shape[2]
    logits = resize_bilinear(logits.astype(jnp.float32), (th, tw),
                             align_corners=align_corners)
    return softmax_cross_entropy(logits, targets, ignore_index=ignore_index)


def make_loss_fn(align_corners: bool = True, use_pallas: bool = True):
    """Loss for the train step. On TPU, when logits are lower-resolution
    than labels (models running with full_res_output=False), uses the fused
    Pallas upsample+CE kernel (ops/pallas/softmax_ce.py) that never
    materializes full-res logits; otherwise the plain XLA path."""
    def loss_fn(logits, targets):
        if use_pallas:
            from .pallas.softmax_ce import fused_upsample_ce
            return fused_upsample_ce(logits, targets,
                                     align_corners=align_corners)
        return compute_loss(logits, targets, align_corners=align_corners)
    return loss_fn


def weighted_cross_entropy(logits: jax.Array, labels: jax.Array, *,
                           class_weights: jax.Array | None = None,
                           label_smoothing: float = 0.0,
                           ohem_frac: float = 0.0,
                           ohem_thresh: float = 0.7,
                           ignore_index: int | None = None) -> jax.Array:
    """Softmax CE with the three production trainer knobs (all composable):

      class_weights [C]   torch nn.CrossEntropyLoss(weight=) semantics:
                          sum_i w[y_i] * ce_i / sum_i w[y_i]
      label_smoothing eps torch label_smoothing semantics (exact,
                          including the weighted composition): the NLL
                          term is weighted by w[y_i], the smooth term by
                          w[c] inside the class sum, BOTH normalized by
                          sum_i w[y_i]:
                            (1-eps) * sum_i w[y_i]*(lse_i - z_iy) / W
                          + (eps/C) * sum_i sum_c w[c]*(lse_i - z_ic) / W
      ohem_frac f > 0     online hard example mining (Shrivastava et al.
                          2016 as realized by mmseg's OhemPixelSampler):
                          keep pixels whose true-class probability is
                          below ohem_thresh, but always at least
                          k = f*N pixels (the k hardest by p_true) —
                          a static-shape top_k realizes the dynamic
                          "lower the threshold until min_kept" rule.
                          The mean is over kept pixels only.

    logits [..., C] (any float), labels [...] int. All math in f32.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    lse = jax.nn.logsumexp(logits, axis=-1)
    safe_labels = labels.astype(jnp.int32)
    valid = None
    if ignore_index is not None:
        valid = labels != ignore_index
        safe_labels = jnp.where(valid, safe_labels, 0)
    true_logit = jnp.take_along_axis(
        logits, safe_labels[..., None], axis=-1, mode="clip")[..., 0]
    nll = lse - true_logit
    cw = None
    wy = jnp.ones_like(nll)
    if class_weights is not None:
        cw = jnp.asarray(class_weights, jnp.float32)
        wy = cw[safe_labels]
    mask = jnp.ones_like(nll)
    if valid is not None:
        mask = valid.astype(jnp.float32)
    if ohem_frac:
        # hardness = true-class probability (mmseg convention). Ignored
        # pixels get p=+inf so they are never kept.
        p_true = jnp.exp(true_logit - lse)
        if valid is not None:
            p_true = jnp.where(valid, p_true, jnp.inf)
        flat_p = p_true.reshape(-1)
        k = max(1, int(float(ohem_frac) * flat_p.shape[0]))
        # k-th smallest p_true = effective floor on the kept set
        neg_topk, _ = jax.lax.top_k(-flat_p, k)
        kth = -neg_topk[-1]
        cutoff = jnp.maximum(jnp.float32(ohem_thresh), kth)
        mask = mask * (flat_p <= cutoff).astype(jnp.float32).reshape(
            p_true.shape)
    denom = jnp.maximum(jnp.sum(wy * mask), 1e-12)
    loss = jnp.sum(nll * wy * mask) / denom
    if label_smoothing:
        eps = float(label_smoothing)
        if cw is None:
            # sum_c (lse - z_c) = C*lse - sum_c z_c
            smooth = num_classes * lse - jnp.sum(logits, axis=-1)
        else:
            smooth = jnp.sum(cw) * lse - jnp.tensordot(logits, cw,
                                                       axes=(-1, 0))
        loss = ((1.0 - eps) * loss
                + (eps / num_classes) * jnp.sum(smooth * mask) / denom)
    return loss


LOSSES = ("ce", "lovasz", "ce+lovasz", "focal", "ce+rect", "dice",
          "ce+dice")


def build_loss(name: str, align_corners: bool = True,
               class_weights=None, label_smoothing: float = 0.0,
               ohem_frac: float = 0.0, ohem_thresh: float = 0.7,
               ignore_index: int | None = None):
    """Named training losses for the CLI (train.py --loss).

    'ce' (default) returns `compute_loss` itself so the Trainer's
    deferred-upsample + fused-Pallas substitution still applies. The other
    names return a custom loss_fn(logits, targets) — the Trainer detects a
    non-default loss and keeps full-res logits (unknown upsample
    semantics), so the upsample below is normally a no-op:

      lovasz     Lovász-softmax (direct mIoU surrogate)
      ce+lovasz  CE + Lovász (common fine-tuning combination)
      focal      focal BCE on one-hot targets (the reference instantiates
                 FocalBCELoss at utils/utils.py:14 but never uses it)
      ce+rect    CE + rectangularity prior — the reference's commented-out
                 RectLoss hook (utils/utils.py:21-23, criterions.py:7-56)
      dice       soft multi-class Dice (classes absent from the batch
                 masked out, like lovasz)
      ce+dice    CE + Dice (the standard medical-segmentation combination)

    class_weights / label_smoothing / ohem_frac (+ohem_thresh) modify the
    CE COMPONENT of the chosen loss (train.py --class-weights /
    --label-smoothing / --ohem): they swap the plain CE for
    `weighted_cross_entropy`. Setting any of them on a loss with no CE
    component (lovasz/focal/dice) is an error. Like every non-default
    loss, the knobs run on full-resolution logits (the fused Pallas CE
    kernel implements only the reference's plain-CE path).
    """
    knobs = (class_weights is not None or label_smoothing or ohem_frac
             or ignore_index is not None)
    if knobs and name not in ("ce", "ce+lovasz", "ce+rect", "ce+dice"):
        raise ValueError(
            f"--class-weights/--label-smoothing/--ohem/--ignore-index "
            f"modify the CE term, but loss {name!r} has none")

    def ce(logits, targets):
        return weighted_cross_entropy(
            logits, targets, class_weights=class_weights,
            label_smoothing=label_smoothing, ohem_frac=ohem_frac,
            ohem_thresh=ohem_thresh, ignore_index=ignore_index)

    if name == "ce":
        if not knobs:
            return compute_loss

        def ce_full(logits, targets):
            th, tw = targets.shape[1], targets.shape[2]
            if (logits.shape[1], logits.shape[2]) != (th, tw):
                logits = resize_bilinear(logits.astype(jnp.float32),
                                         (th, tw),
                                         align_corners=align_corners)
            return ce(logits, targets)
        return ce_full

    def up(logits, targets):
        th, tw = targets.shape[1], targets.shape[2]
        if (logits.shape[1], logits.shape[2]) != (th, tw):
            logits = resize_bilinear(logits.astype(jnp.float32), (th, tw),
                                     align_corners=align_corners)
        return logits.astype(jnp.float32)

    if name == "lovasz":
        return lambda logits, targets: lovasz_softmax_loss(
            up(logits, targets), targets)
    if name == "ce+lovasz":
        def ce_lovasz(logits, targets):
            l = up(logits, targets)
            return ce(l, targets) + lovasz_softmax_loss(l, targets)
        return ce_lovasz
    if name == "focal":
        def focal(logits, targets):
            l = up(logits, targets)
            onehot = jax.nn.one_hot(targets, l.shape[-1], axis=-1)
            return focal_bce_loss(l, onehot)
        return focal
    if name == "ce+rect":
        from .rect_loss import rect_loss

        def ce_rect(logits, targets):
            l = up(logits, targets)
            return ce(l, targets) + rect_loss(l)
        return ce_rect
    if name == "dice":
        return lambda logits, targets: dice_loss(up(logits, targets),
                                                 targets)
    if name == "ce+dice":
        def ce_dice(logits, targets):
            l = up(logits, targets)
            return ce(l, targets) + dice_loss(l, targets)
        return ce_dice
    raise ValueError(f"unknown loss {name!r} (choose from {LOSSES})")


def dice_loss(logits: jax.Array, targets: jax.Array,
              smooth: float = 1.0) -> jax.Array:
    """Soft multi-class Dice loss: 1 - mean over present classes of
    2|P∩G|/(|P|+|G|) on softmax probabilities. Classes absent from the
    batch are masked (static-shape; same convention as
    lovasz_softmax_loss). logits [..., C], targets [...] int.

    Memory note: |P∩G| is a per-class segment-sum of the true-class
    probabilities and |G| a bincount — no [N, C] one-hot materializes
    (at the bench config that transient alone would be ~700 MB)."""
    num_classes = logits.shape[-1]
    probas = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probas = probas.reshape(-1, num_classes)
    t = targets.reshape(-1).astype(jnp.int32)
    p_true = jnp.take_along_axis(probas, t[:, None], axis=-1)[:, 0]
    inter = jax.ops.segment_sum(p_true, t, num_segments=num_classes)
    gt_count = jnp.zeros(num_classes, jnp.float32).at[t].add(1.0)
    card = jnp.sum(probas, axis=0) + gt_count
    dice = (2.0 * inter + smooth) / (card + smooth)
    present = gt_count > 0
    n_present = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
    return 1.0 - jnp.sum(jnp.where(present, dice, 0.0)) / n_present


def focal_bce_loss(logits: jax.Array, targets_onehot: jax.Array,
                   gamma: float = 2.0, alpha: float = 0.25) -> jax.Array:
    """Focal binary CE (equivalent of pytorch_modules.nn.FocalBCELoss,
    instantiated at reference utils/utils.py:14)."""
    logits = logits.astype(jnp.float32)
    t = targets_onehot.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    # stable BCE-with-logits
    bce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * t + (1 - p) * (1 - t)
    alpha_t = alpha * t + (1 - alpha) * (1 - t)
    return jnp.mean(alpha_t * (1 - p_t) ** gamma * bce)


def _lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovász extension w.r.t. sorted errors."""
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-9)
    if p > 1:
        jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def lovasz_softmax_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Multi-class Lovász-softmax (working version of the reference's intended
    utils/criterions.py:77-131). logits [..., C], labels [...] int.

    Classes absent from the batch contribute zero (masked, static-shape —
    XLA-friendly replacement for the reference's dynamic `classes='present'`).
    """
    num_classes = logits.shape[-1]
    probas = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probas = probas.reshape(-1, num_classes)
    labels = labels.reshape(-1)

    def class_loss(c):
        fg = (labels == c).astype(jnp.float32)
        errors = jnp.abs(fg - probas[:, c])
        errors_sorted, perm = jax.lax.top_k(errors, errors.shape[0])
        fg_sorted = fg[perm]
        loss_c = jnp.dot(errors_sorted, _lovasz_grad(fg_sorted))
        present = jnp.sum(fg) > 0
        return jnp.where(present, loss_c, 0.0), present.astype(jnp.float32)

    losses, present = jax.vmap(class_loss)(jnp.arange(num_classes))
    return jnp.sum(losses) / jnp.maximum(jnp.sum(present), 1.0)
