"""Inference core (rebuild of reference utils/inference.py:8-21).

Pipeline: resize to img_size -> BGR->RGB -> normalize -> jitted forward +
softmax on device -> per-image bilinear resize of probabilities back to the
original resolution -> argmax.

Preprocessing contract fix (SURVEY.md §2.2): the reference trains with
ImageNet mean/std but divides by 255 at inference — a train/serve mismatch.
We default to the *training* normalization; pass legacy_preproc=True to
reproduce the reference's /255 behaviour bit-for-bit.
"""

from __future__ import annotations

import functools

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from .data.datasets import IMAGENET_MEAN, IMAGENET_STD

__all__ = ["inference", "make_infer_fn", "make_mask_fn"]


@functools.lru_cache(maxsize=8)
def _jitted_infer(apply_fn, legacy_preproc: bool, int8: bool,
                  calibrated: bool):
    def run(variables, images_u8):
        x = images_u8.astype(jnp.float32)
        if legacy_preproc:
            x = x / 255.0
        else:
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        if int8:
            # int8 PTQ forward (quant.py): calibrated per-tensor activation
            # scales (from the "quant_stats" in variables) or dynamic
            # per-batch scales (no calibration artifacts needed)
            from .quant import quant_mode
            with quant_mode("int8" if calibrated else "int8dyn"):
                logits = apply_fn(variables, x, train=False)
        else:
            logits = apply_fn(variables, x, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jax.jit(run)


def make_infer_fn(model, legacy_preproc: bool = False, int8: bool = False,
                  quant_stats=None):
    """model: engine.trainer.ModelBundle. Returns fn(images_u8 NHWC RGB) ->
    probs [B, H, W, C] f32 (device). int8=True runs every eligible conv on
    the int8 MXU path — dynamic activation scales, or calibrated when
    `quant_stats` (from quant.calibrate/calibrate_from_u8) is passed."""
    if quant_stats is not None:
        int8 = True
    jitted = _jitted_infer(model.apply_fn, legacy_preproc, int8,
                           quant_stats is not None)
    variables = {"params": model.params, "batch_stats": model.batch_stats}
    if quant_stats is not None:
        variables = {**variables, "quant_stats": quant_stats}

    def fn(images_u8):
        return jitted(variables, jnp.asarray(images_u8))
    return fn


def make_mask_fn(model, out_hw=None, legacy_preproc: bool = False):
    """Fixed-size SERVING path: fn(images_u8 NHWC RGB) -> int32 argmax
    masks [B, *out_hw] (device), one jitted program.

    Unlike `inference()` (which matches the reference CLI contract —
    utils/inference.py:8-21 — and resizes probabilities to each image's
    own original size on the host), this keeps everything on device at a
    fixed output size: normalize -> forward -> bilinear-upsample+argmax.
    On TPU with low-res logits the upsample+argmax is the fused Pallas
    kernel (ops/pallas/upsample_argmax.py; 833 img/s at 32x513^2, see
    PERF.md). out_hw=None upsamples to the input image size. Softmax is
    skipped: per-pixel argmax of logits equals argmax of softmax.
    """
    variables = {"params": model.params, "batch_stats": model.batch_stats}
    apply_fn = model.apply_fn
    align = getattr(model.module, "up_align_corners", True)

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(images_u8, hw):
        x = images_u8.astype(jnp.float32)
        if legacy_preproc:
            x = x / 255.0
        else:
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        logits = apply_fn(variables, x, train=False)
        on_tpu = jax.devices()[0].platform == "tpu"
        if (logits.shape[1], logits.shape[2]) == tuple(hw):
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        from .ops.pallas.softmax_ce import forward_kernel_fits
        if on_tpu and forward_kernel_fits(logits.shape[-1], logits.shape[1],
                                          logits.shape[2], hw[1],
                                          logits.dtype.itemsize):
            from .ops.pallas.upsample_argmax import fused_upsample_argmax
            return fused_upsample_argmax(logits, tuple(hw),
                                         align_corners=align)
        from .ops.resize import resize_bilinear
        up = resize_bilinear(logits.astype(jnp.float32), hw,
                             align_corners=align)
        return jnp.argmax(up, axis=-1).astype(jnp.int32)

    def fn(images_u8):
        images_u8 = jnp.asarray(images_u8)
        hw = tuple(out_hw) if out_hw is not None \
            else (images_u8.shape[1], images_u8.shape[2])
        return run(images_u8, hw)
    return fn


def inference(model, imgs, img_size=(64, 64), legacy_preproc: bool = False,
              int8: bool = False, calib: bool = False, quant_stats=None):
    """imgs: list of BGR uint8 HWC arrays (cv2-style, like the reference).
    Returns a list of [H_orig, W_orig] int argmax masks.

    int8=True: quantized forward with dynamic activation scales.
    calib=True additionally self-calibrates the scales on THIS input batch
    (the calibrated mode is the faster deployment config — PERF.md); to
    calibrate once and reuse across calls, pass `quant_stats` from
    quant.calibrate_from_u8 instead (inference.py CLI --calib does this
    with the first batch)."""
    shapes = [img.shape for img in imgs]
    batch = np.stack([
        cv2.resize(img, tuple(img_size))[:, :, ::-1] for img in imgs
    ]).astype(np.uint8)
    if int8 and calib and quant_stats is None:
        from .quant import calibrate_from_u8
        quant_stats = calibrate_from_u8(model, jnp.asarray(batch),
                                        legacy_preproc)
    infer = make_infer_fn(model, legacy_preproc, int8=int8,
                          quant_stats=quant_stats)
    probs = np.asarray(infer(batch))
    preds = [
        cv2.resize(p, (shape[1], shape[0])).argmax(axis=2)
        for p, shape in zip(probs, shapes)
    ]
    return preds
