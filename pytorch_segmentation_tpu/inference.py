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

__all__ = ["inference", "make_infer_fn"]


@functools.lru_cache(maxsize=8)
def _jitted_infer(apply_fn, legacy_preproc: bool):
    def run(variables, images_u8):
        x = images_u8.astype(jnp.float32)
        if legacy_preproc:
            x = x / 255.0
        else:
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        logits = apply_fn(variables, x, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jax.jit(run)


def make_infer_fn(model, legacy_preproc: bool = False):
    """model: engine.trainer.ModelBundle. Returns fn(images_u8 NHWC RGB) ->
    probs [B, H, W, C] f32 (device)."""
    jitted = _jitted_infer(model.apply_fn, legacy_preproc)
    variables = {"params": model.params, "batch_stats": model.batch_stats}

    def fn(images_u8):
        return jitted(variables, jnp.asarray(images_u8))
    return fn


def inference(model, imgs, img_size=(64, 64), legacy_preproc: bool = False):
    """imgs: list of BGR uint8 HWC arrays (cv2-style, like the reference).
    Returns a list of [H_orig, W_orig] int argmax masks."""
    infer = make_infer_fn(model, legacy_preproc)
    shapes = [img.shape for img in imgs]
    batch = np.stack([
        cv2.resize(img, tuple(img_size))[:, :, ::-1] for img in imgs
    ]).astype(np.uint8)
    probs = np.asarray(infer(batch))
    preds = [
        cv2.resize(p, (shape[1], shape[0])).argmax(axis=2)
        for p, shape in zip(probs, shapes)
    ]
    return preds
