"""Post-training int8 quantization (PTQ) for serving.

A capability beyond the reference (WoodsGao/pytorch_segmentation serves
fp32; its only export path is Caffe — export2caffe.py:12-22). On TPU v5e
the int8 MXU path is real: 1.54x peak matmul and 1.37x on the MXU-bound
conv shapes, plus halved activation HBM bytes (PERF.md round 3,
tools/bench_int8.py) — so a quantized serving path is worth having.

Scheme (the standard PTQ recipe, TPU-shaped):
  - weights: symmetric per-OUT-CHANNEL int8, scales from |w| max — folded
    into the conv's f32 rescale, so no accuracy loss from bias terms
  - activations: symmetric per-tensor int8; scale per ConvNormAct input,
    calibrated as the abs-max over calibration batches ("int8"), or taken
    from the live batch ("int8dyn", no calibration artifacts, one extra
    reduce per layer)
  - conv accumulates in int32 on the MXU (preferred_element_type), then
    one f32 multiply by s_x * s_w[outchannel]; BatchNorm (running stats)
    and the activation run unquantized exactly as in bf16 serving
  - grouped/depthwise convs and everything outside ConvNormAct (residual
    adds, resize, the final classifier conv, fused argmax kernel) stay in
    bf16/f32 — they are floor-/bandwidth-bound, not MXU-bound

The mode is a trace-time switch (nn.blocks.set_quant_mode); the helpers
here set it INSIDE the traced function body via a context manager, so
every (re)trace of a quantized program sees the right mode and
unquantized programs are never affected.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

from .data.datasets import IMAGENET_MEAN, IMAGENET_STD
from .nn import blocks

__all__ = ["quant_mode", "quant_min_k", "calibrate", "calibrate_from_u8",
           "make_quant_mask_fn"]


@contextmanager
def quant_mode(mode):
    """Scoped nn.blocks quant mode. Wrap the BODY of a function being
    traced (or the apply call itself) so the mode is active at trace time
    and restored afterwards."""
    prev = blocks.get_quant_mode()
    blocks.set_quant_mode(mode)
    try:
        yield
    finally:
        blocks.set_quant_mode(prev)


@contextmanager
def quant_min_k(min_k: int):
    """Scoped per-layer int8 gate (blocks._QUANT_MIN_K): only convs with
    contraction K = kh*kw*Cin >= min_k are quantized. The default skips
    floor-/bandwidth-bound convs where int8 measured slower than bf16
    (tools/bench_quant_gate.py); 0 quantizes every eligible conv."""
    prev = blocks.get_quant_min_k()
    blocks.set_quant_min_k(min_k)
    try:
        yield
    finally:
        blocks.set_quant_min_k(prev)


def calibrate(module, variables, batches):
    """Run calibration forward passes and return the "quant_stats"
    collection: one input abs-max scalar per quantizable ConvNormAct.

    module: the flax model; variables: {"params", "batch_stats"};
    batches: iterable of NORMALIZED input arrays [B, H, W, 3] (the same
    preprocessing the quantized serving path will use — scales must see
    serving-domain values).
    """
    # .get: a model with no quantizable ConvNormAct (e.g. SegFormer, whose
    # split-fuse decoder distributes its only 1x1 conv) creates no
    # quant_stats variables at all — calibration is then a valid no-op
    # and int8 serving falls through to the bf16 path layer by layer
    @jax.jit
    def first(v, x):
        with quant_mode("calib"):
            _, mut = module.apply(v, x, train=False,
                                  mutable=["quant_stats"])
        return mut.get("quant_stats", {})

    @jax.jit
    def update(v, qs, x):
        with quant_mode("calib"):
            _, mut = module.apply({**v, "quant_stats": qs}, x, train=False,
                                  mutable=["quant_stats"])
        return mut.get("quant_stats", {})

    qs = None
    for x in batches:
        x = jnp.asarray(x)
        qs = first(variables, x) if qs is None else update(variables, qs, x)
    if qs is None:
        raise ValueError("calibrate() needs at least one batch")
    return qs


def _normalize_u8(images_u8, legacy_preproc: bool):
    x = images_u8.astype(jnp.float32)
    if legacy_preproc:
        return x / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def calibrate_from_u8(model, calib_images_u8, legacy_preproc: bool = False):
    """Calibrate from raw uint8 RGB batches (serving input contract).
    model: engine.trainer.ModelBundle; calib_images_u8: one array or an
    iterable of [B, H, W, 3] u8 arrays."""
    if hasattr(calib_images_u8, "shape"):
        calib_images_u8 = [calib_images_u8]
    variables = {"params": model.params, "batch_stats": model.batch_stats}
    batches = (_normalize_u8(jnp.asarray(b), legacy_preproc)
               for b in calib_images_u8)
    return calibrate(model.module, variables, batches)


def make_quant_mask_fn(model, out_hw=None, legacy_preproc: bool = False,
                       quant_stats=None, mesh=None):
    """int8 twin of inference.make_mask_fn: fn(images_u8 NHWC RGB) ->
    int32 argmax masks [B, *out_hw] (device), one jitted program with
    every eligible conv on the int8 MXU path.

    quant_stats: the collection from calibrate()/calibrate_from_u8().
    None -> dynamic activation scales ("int8dyn" — scale from each live
    batch; no calibration needed, one extra reduce per layer).
    """
    import functools

    variables = {"params": model.params, "batch_stats": model.batch_stats}
    mode = "int8dyn" if quant_stats is None else "int8"
    if quant_stats is not None:
        variables = {**variables, "quant_stats": quant_stats}
    if mesh is not None:
        # multi-chip serving: params replicate, batch shards over 'data'
        from .inference import _shard_serving
        variables = _shard_serving(variables, mesh)
    apply_fn = model.module.apply
    align = getattr(model.module, "up_align_corners", True)

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(images_u8, hw):
        x = _normalize_u8(images_u8, legacy_preproc)
        with quant_mode(mode):
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
        if mesh is not None:
            from .inference import _shard_batch_u8
            images_u8 = _shard_batch_u8(images_u8, mesh)
        hw = tuple(out_hw) if out_hw is not None \
            else (images_u8.shape[1], images_u8.shape[2])
        return run(images_u8, hw)
    return fn
