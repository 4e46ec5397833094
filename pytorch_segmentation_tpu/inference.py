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

__all__ = ["inference", "make_infer_fn", "make_mask_fn",
           "make_tiled_mask_fn"]


@functools.lru_cache(maxsize=8)
def _jitted_infer(apply_fn, legacy_preproc: bool, int8: bool,
                  calibrated: bool, tta_flip: bool = False,
                  tta_scales: tuple = ()):
    def run(variables, images_u8):
        x = images_u8.astype(jnp.float32)
        if legacy_preproc:
            x = x / 255.0
        else:
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

        def fwd(xx):
            if int8:
                # int8 PTQ forward (quant.py): calibrated per-tensor
                # activation scales (from the "quant_stats" in variables)
                # or dynamic per-batch scales (no calibration artifacts)
                from .quant import quant_mode
                with quant_mode("int8" if calibrated else "int8dyn"):
                    return apply_fn(variables, xx, train=False)
            return apply_fn(variables, xx, train=False)

        from .ops.tta import tta_logits
        logits = tta_logits(fwd, x, scales=tta_scales, flip=tta_flip)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jax.jit(run)


def make_infer_fn(model, legacy_preproc: bool = False, int8: bool = False,
                  quant_stats=None, tta_flip: bool = False, tta_scales=()):
    """model: engine.trainer.ModelBundle. Returns fn(images_u8 NHWC RGB) ->
    probs [B, H, W, C] f32 (device). int8=True runs every eligible conv on
    the int8 MXU path — dynamic activation scales, or calibrated when
    `quant_stats` (from quant.calibrate/calibrate_from_u8) is passed.
    tta_flip=True averages logits with a horizontally-flipped second
    forward (flip TTA, ~2x cost); tta_scales=(0.75, 1.25, ...) adds
    multi-scale TTA (ops/tta.py), composing with the flip."""
    if quant_stats is not None:
        int8 = True
    from .ops.tta import normalize_tta_scales
    jitted = _jitted_infer(model.apply_fn, legacy_preproc, int8,
                           quant_stats is not None, tta_flip,
                           normalize_tta_scales(tta_scales))
    variables = {"params": model.params, "batch_stats": model.batch_stats}
    if quant_stats is not None:
        variables = {**variables, "quant_stats": quant_stats}

    def fn(images_u8):
        return jitted(variables, jnp.asarray(images_u8))
    return fn


def _shard_serving(variables, mesh):
    """Replicate serving params over `mesh` (multi-chip serving: the batch
    shards over 'data', GSPMD splits the whole program — no code change
    in the jitted body)."""
    from .parallel.mesh import replicated_sharding
    return jax.device_put(variables, replicated_sharding(mesh))


def _shard_batch_u8(images_u8, mesh):
    from .parallel.mesh import data_sharding
    n = mesh.shape[mesh.axis_names[0]]
    if images_u8.shape[0] % n:
        raise ValueError(
            f"serving batch {images_u8.shape[0]} must be divisible by the "
            f"mesh's data axis ({n}) — pad the batch (MaskServer does)")
    return jax.device_put(images_u8, data_sharding(mesh))


def make_mask_fn(model, out_hw=None, legacy_preproc: bool = False,
                 tta_flip: bool = False, tta_scales=(), mesh=None):
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
    tta_flip=True averages logits with a horizontally-flipped second
    forward before the fused upsample+argmax (flip TTA, ~2x cost);
    tta_scales adds multi-scale TTA (ops/tta.py), composing with the flip.
    mesh=make_mesh() scales serving over every local chip: params
    replicate, the batch shards over 'data' (must divide by the axis
    size), and the compiled program runs SPMD — same masks, N chips.
    """
    variables = {"params": model.params, "batch_stats": model.batch_stats}
    if mesh is not None:
        variables = _shard_serving(variables, mesh)
    apply_fn = model.apply_fn
    align = getattr(model.module, "up_align_corners", True)
    from .ops.tta import normalize_tta_scales, tta_logits
    tta_scales = normalize_tta_scales(tta_scales)

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(images_u8, hw):
        x = images_u8.astype(jnp.float32)
        if legacy_preproc:
            x = x / 255.0
        else:
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        logits = tta_logits(
            lambda xx: apply_fn(variables, xx, train=False), x,
            scales=tta_scales, flip=tta_flip, align_corners=align)
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
        if mesh is not None:
            images_u8 = _shard_batch_u8(images_u8, mesh)
        hw = tuple(out_hw) if out_hw is not None \
            else (images_u8.shape[1], images_u8.shape[2])
        return run(images_u8, hw)
    return fn


def _tile_offsets(size: int, tile: int, overlap: float):
    """Evenly spaced tile offsets covering [0, size) with ~overlap fraction
    of tile overlap; the last tile is flush with the end (python ints —
    static per jitted grid)."""
    if size <= tile:
        return (0,)
    stride = max(1, int(round(tile * (1.0 - overlap))))
    n = -(-(size - tile) // stride) + 1  # ceil
    last = size - tile
    return tuple(int(round(i * last / (n - 1))) for i in range(n))


def make_tiled_mask_fn(model, tile_hw=(513, 513), overlap: float = 0.25,
                       legacy_preproc: bool = False, tta_flip: bool = False,
                       tta_scales=()):
    """Sliding-window serving for images LARGER than the training
    resolution: fn(images_u8 NHWC RGB) -> int32 masks [B, H, W] at the
    input's own resolution.

    The reference CLI downscales every image to img_size and upscales the
    mask back (utils/inference.py:8-21) — at 4K input that throws away 8x
    linear detail. This path instead runs the network at native resolution
    over a static grid of tile_hw windows (~`overlap` fraction overlapping),
    sums per-tile logits on a canvas (overlap regions average; per-pixel
    argmax is invariant to the positive per-pixel weight, so no division),
    and argmaxes once.

    TPU-native: the grid is static per input shape, the tile forward is
    traced ONCE inside a lax.fori_loop (compile time independent of grid
    size), tiles/canvas are updated with lax.dynamic_slice /
    dynamic_update_slice, and the pad region is ImageNet-mean (zeros after
    normalize). Masks for the pad are cropped off. tta_flip / tta_scales
    compose: each tile is flip- and multi-scale-averaged (ops/tta.py).
    """
    variables = {"params": model.params, "batch_stats": model.batch_stats}
    apply_fn = model.apply_fn
    align = getattr(model.module, "up_align_corners", True)
    th, tw = int(tile_hw[0]), int(tile_hw[1])
    from .ops.tta import normalize_tta_scales, tta_logits
    tta_scales = normalize_tta_scales(tta_scales)

    def fwd(x):
        logits = tta_logits(
            lambda xx: apply_fn(variables, xx, train=False), x,
            scales=tta_scales, flip=tta_flip, align_corners=align)
        if (logits.shape[1], logits.shape[2]) != (th, tw):
            from .ops.resize import resize_bilinear
            logits = resize_bilinear(logits.astype(jnp.float32), (th, tw),
                                     align_corners=align)
        return logits.astype(jnp.float32)

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def run(images_u8, offs_h, offs_w):
        b, h, w = images_u8.shape[:3]
        x = images_u8.astype(jnp.float32)
        if legacy_preproc:
            x = x / 255.0
        else:
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        hp, wp = max(h, th), max(w, tw)
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        nc = jax.eval_shape(fwd, jax.ShapeDtypeStruct((b, th, tw, 3),
                                                      x.dtype)).shape[-1]
        oh = jnp.asarray(offs_h, jnp.int32)
        ow = jnp.asarray(offs_w, jnp.int32)
        nw = len(offs_w)

        def body(i, canvas):
            y0, x0 = oh[i // nw], ow[i % nw]
            tile = jax.lax.dynamic_slice(x, (0, y0, x0, 0), (b, th, tw, 3))
            logits = fwd(tile)
            cur = jax.lax.dynamic_slice(canvas, (0, y0, x0, 0),
                                        (b, th, tw, nc))
            return jax.lax.dynamic_update_slice(canvas, cur + logits,
                                                (0, y0, x0, 0))

        canvas = jnp.zeros((b, hp, wp, nc), jnp.float32)
        canvas = jax.lax.fori_loop(0, len(offs_h) * nw, body, canvas)
        return jnp.argmax(canvas[:, :h, :w], axis=-1).astype(jnp.int32)

    def fn(images_u8):
        images_u8 = jnp.asarray(images_u8)
        h, w = int(images_u8.shape[1]), int(images_u8.shape[2])
        return run(images_u8, _tile_offsets(h, th, overlap),
                   _tile_offsets(w, tw, overlap))
    return fn


def inference(model, imgs, img_size=(64, 64), legacy_preproc: bool = False,
              int8: bool = False, calib: bool = False, quant_stats=None,
              tta_flip: bool = False, tta_scales=()):
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
                          quant_stats=quant_stats, tta_flip=tta_flip,
                          tta_scales=tta_scales)
    probs = np.asarray(infer(batch))
    preds = [
        cv2.resize(p, (shape[1], shape[0])).argmax(axis=2)
        for p, shape in zip(probs, shapes)
    ]
    return preds
