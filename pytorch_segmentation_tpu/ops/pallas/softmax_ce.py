"""Pallas TPU kernel: fused bilinear-upsample + softmax cross-entropy.

The reference loss (utils/utils.py:17-24) bilinearly upsamples logits to the
label resolution (align_corners=True) and takes mean CE. At DeepLabV3+'s
output stride the naive path materializes full-res logits in HBM —
[B, 513, 513, 21] f32 is ~22 MB per image, written + read again by
logsumexp/gather (and the same again for grads in the backward). This kernel
streams row-tiles and classes instead:

  per (batch b, row-tile t):
    for class c (static unroll):            # logits held class-major [C,h,w]
      up_c = Mh[t] @ logits[b,c] @ Mw^T     # two 2-D MXU contractions
      online-logsumexp update; accumulate true-logit
    partial += sum(lse - true_logit)

and the custom VJP recomputes per-class tiles into VMEM scratch and pushes
the softmax residual back through the transposed interpolation matrices:

    dlogits[b,c] += Mh[t]^T @ (softmax_c(up) - onehot_c) @ Mw

Design notes for Mosaic: everything is strictly 2-D matmuls + elementwise —
no reshapes or transposes that touch the lane dimension (Mosaic's
infer-vector-layout rejects those); class-major layout makes the class loop
a cheap leading-dim index; scalar tile-partials accumulate into an (8,128)
VMEM tile per batch element ((1,1) output blocks violate the 8x128 tiling
constraint).

Interpolation matrices come from ops/resize._interp_weights, so coordinate
semantics are bit-identical to the XLA path (tested in
tests/test_pallas_ce.py, interpret mode).

Use `fused_upsample_ce` (falls back to the plain XLA path off-TPU or when
logits are already at label resolution).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..resize import _interp_weights

__all__ = ["fused_upsample_ce", "upsample_ce_reference"]

_NEG_BIG = -1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


def upsample_ce_reference(logits, labels, align_corners=True):
    """Plain-XLA reference semantics (used as fallback and in tests)."""
    from ..loss import compute_loss
    return compute_loss(logits, labels, align_corners=align_corners)


def _upsample_class(logits_c, mh, mw):
    """[h, w] -> [tile, W]: two 2-D MXU contractions.

    logits arrive in the model's compute dtype (bf16) and are upcast per
    VMEM tile — bitwise identical to upcasting in HBM first (bf16->f32 is
    exact) at half the HBM traffic for the class-major tensor."""
    a = jax.lax.dot_general(mh, logits_c.astype(jnp.float32),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, mw, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _scalar_tile(value):
    """Place a scalar into lane (0,0) of a (1,8,128) accumulator tile."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    return jnp.where((lane == 0) & (sub == 0), value, 0.0)


def _fwd_kernel(logits_ref, labels_ref, mh_ref, mw_ref, out_ref, *,
                tile: int, h_out: int, num_classes: int):
    """grid = (B, n_tiles); logits_ref [1, C, h, w] class-major."""
    mh = mh_ref[...]                    # [tile, h]
    mw = mw_ref[...]                    # [W, w]
    labels = labels_ref[0]              # [tile, W]
    w_out = labels.shape[1]

    m = jnp.full((tile, w_out), _NEG_BIG, jnp.float32)   # running max
    s = jnp.zeros((tile, w_out), jnp.float32)            # running sum-exp
    true_logit = jnp.zeros((tile, w_out), jnp.float32)
    for c in range(num_classes):                          # static unroll
        up_c = _upsample_class(logits_ref[0, c], mh, mw)
        m_new = jnp.maximum(m, up_c)
        s = s * jnp.exp(m - m_new) + jnp.exp(up_c - m_new)
        m = m_new
        true_logit += jnp.where(labels == c, up_c, 0.0)
    lse = m + jnp.log(s)

    ti = pl.program_id(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, w_out), 0)
    valid = (row_ids + ti * tile) < h_out
    per_pixel = jnp.where(valid, lse - true_logit, 0.0)

    @pl.when(ti == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += _scalar_tile(jnp.sum(per_pixel))


def _bwd_kernel(logits_ref, labels_ref, mh_ref, mw_ref, dlogits_ref,
                up_scratch, *, tile: int, h_out: int, num_classes: int,
                inv_n: float):
    """dlogits_ref [1, C, h, w]; up_scratch [C, tile, W] VMEM."""
    mh = mh_ref[...]
    mw = mw_ref[...]
    labels = labels_ref[0]
    w_out = labels.shape[1]

    m = jnp.full((tile, w_out), _NEG_BIG, jnp.float32)
    s = jnp.zeros((tile, w_out), jnp.float32)
    for c in range(num_classes):
        up_c = _upsample_class(logits_ref[0, c], mh, mw)
        up_scratch[c] = up_c
        m_new = jnp.maximum(m, up_c)
        s = s * jnp.exp(m - m_new) + jnp.exp(up_c - m_new)
        m = m_new
    lse = m + jnp.log(s)

    ti = pl.program_id(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, w_out), 0)
    valid = (row_ids + ti * tile) < h_out

    @pl.when(ti == 0)
    def _():
        dlogits_ref[...] = jnp.zeros_like(dlogits_ref)

    for c in range(num_classes):
        p_c = jnp.exp(up_scratch[c] - lse)
        onehot_c = (labels == c).astype(jnp.float32)
        resid = jnp.where(valid, (p_c - onehot_c) * inv_n, 0.0)  # [tile, W]
        # d = mh^T @ (resid @ mw): resid [tile, W] x mw [W, w] -> [tile, w]
        d1 = jax.lax.dot_general(resid, mw, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        d = jax.lax.dot_general(mh, d1, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [h, w]
        dlogits_ref[0, c] += d


def _fwd_lse_kernel(logits_ref, labels_ref, mh_ref, mw_ref, out_ref,
                    lse_ref, *, tile: int, h_out: int, num_classes: int):
    """Forward for the EXTENDED class range (65..128): same online-softmax
    pass as _fwd_kernel, but also writes the per-pixel logsumexp tile so the
    class-blocked backward (_bwd_cb_kernel) never needs all classes resident
    at once."""
    mh = mh_ref[...]
    mw = mw_ref[...]
    labels = labels_ref[0]
    w_out = labels.shape[1]

    m = jnp.full((tile, w_out), _NEG_BIG, jnp.float32)
    s = jnp.zeros((tile, w_out), jnp.float32)
    true_logit = jnp.zeros((tile, w_out), jnp.float32)
    for c in range(num_classes):
        up_c = _upsample_class(logits_ref[0, c], mh, mw)
        m_new = jnp.maximum(m, up_c)
        s = s * jnp.exp(m - m_new) + jnp.exp(up_c - m_new)
        m = m_new
        true_logit += jnp.where(labels == c, up_c, 0.0)
    lse = m + jnp.log(s)
    lse_ref[0] = lse

    ti = pl.program_id(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, w_out), 0)
    valid = (row_ids + ti * tile) < h_out
    per_pixel = jnp.where(valid, lse - true_logit, 0.0)

    @pl.when(ti == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += _scalar_tile(jnp.sum(per_pixel))


def _bwd_cb_kernel(logits_ref, labels_ref, lse_ref, mh_ref, mw_ref,
                   dlogits_ref, *, tile: int, h_out: int, cb: int,
                   inv_n: float):
    """Class-blocked backward: grid = (B, n_class_blocks, n_tiles), logits
    block [1, cb, h, w]. With the forward's lse saved as a residual, each
    class's softmax residual is independent — so only `cb` classes are ever
    resident, and the scoped-VMEM working set is ~C/cb times smaller than
    the all-class _bwd_kernel (which blows the 32 MiB limit inside the full
    train-step program at C=81)."""
    mh = mh_ref[...]
    mw = mw_ref[...]
    labels = labels_ref[0]
    lse = lse_ref[0]
    w_out = labels.shape[1]

    ci = pl.program_id(1)
    ti = pl.program_id(2)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, w_out), 0)
    valid = (row_ids + ti * tile) < h_out

    @pl.when(ti == 0)
    def _():
        dlogits_ref[...] = jnp.zeros_like(dlogits_ref)

    for j in range(cb):
        c = ci * cb + j  # global class id (traced scalar)
        up_c = _upsample_class(logits_ref[0, j], mh, mw)
        p_c = jnp.exp(up_c - lse)
        onehot_c = (labels == c).astype(jnp.float32)
        resid = jnp.where(valid, (p_c - onehot_c) * inv_n, 0.0)
        d1 = jax.lax.dot_general(resid, mw, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        d = jax.lax.dot_general(mh, d1, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        dlogits_ref[0, j] += d


def _pad_rows(mat, tile):
    n = mat.shape[0]
    pad = _round_up(n, tile) - n
    if pad:
        mat = np.concatenate([mat, np.zeros((pad, mat.shape[1]),
                                            mat.dtype)], 0)
    return mat


def _prep(hh, ww, labels, out_hw, align_corners, tile):
    """Shared with eval_confusion: interpolation matrices (Mh row-padded to
    the tile multiple) + row-padded labels. (hh, ww) = logits spatial dims."""
    h_out, w_out = out_hw
    mh = _pad_rows(_interp_weights(hh, h_out, align_corners), tile)
    mw = _interp_weights(ww, w_out, align_corners)
    pad_rows = mh.shape[0] - h_out
    labels_p = labels.astype(jnp.int32)
    if pad_rows:
        labels_p = jnp.pad(labels_p, ((0, 0), (0, pad_rows), (0, 0)),
                           constant_values=0)
    return jnp.asarray(mh), jnp.asarray(mw), labels_p


def _common_in_specs(hh, ww, cc, tile, w_out):
    return [
        # class-major logits: leading-dim class indexing is layout-free
        pl.BlockSpec((1, cc, hh, ww), lambda bi, ti: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, w_out), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, hh), lambda bi, ti: (ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_ce(logits, labels, out_hw, align_corners, tile):
    s, _ = _fused_ce_fwd(logits, labels, out_hw, align_corners, tile)
    return s


def _pick_cb(cc: int) -> int:
    """Class-block size for the class-blocked backward: prefer an exact
    divisor in [4, 16], largest first (COCO-81 -> 9, VOC-21 -> 7; zero
    padding), else 16 with the class axis padded up."""
    for cb in range(16, 3, -1):
        if cc % cb == 0:
            return cb
    return 16


# Backward-kernel routing: "auto" = class-blocked for 65..128 classes,
# all-class recompute for <=64 (measured-good at VOC-21). "cb" forces the
# class-blocked pair everywhere — a trace-time measurement knob
# (tools/bench_ab.py-style A/B; same pattern as nn.blocks.set_force_fused_1x1).
_CE_BWD_MODE = "auto"


def set_ce_bwd_mode(mode: str):
    global _CE_BWD_MODE
    assert mode in ("auto", "cb"), mode
    _CE_BWD_MODE = mode


def _use_cb(cc: int) -> bool:
    return cc > 64 or _CE_BWD_MODE == "cb"


def _fwd_partials(logits, labels, out_hw, align_corners, tile,
                  want_lse: bool = True):
    """Per-sample CE pixel SUMS [B] plus the residuals the VJP needs.
    logits stay in their native dtype (bf16 on the TPU hot path).

    For <=64 classes the backward recomputes the online softmax from the
    saved logits (measured-good config, e.g. VOC-21). For 65..128 classes
    the forward also emits per-pixel logsumexp tiles so the backward can be
    class-blocked (see _bwd_cb_kernel); forward-only callers (eval's
    per-sample loss) pass want_lse=False to skip that extra HBM write."""
    b, hh, ww, cc = logits.shape
    mh, mw, labels_p = _prep(hh, ww, labels, out_hw, align_corners, tile)
    h_out, w_out = out_hw
    logits_cm = jnp.transpose(logits, (0, 3, 1, 2))  # [B, C, h, w]
    n_tiles = mh.shape[0] // tile
    if not (_use_cb(cc) and want_lse):
        partials = pl.pallas_call(
            functools.partial(_fwd_kernel, tile=tile, h_out=h_out,
                              num_classes=cc),
            grid=(b, n_tiles),
            in_specs=_common_in_specs(hh, ww, cc, tile, w_out),
            out_specs=pl.BlockSpec((1, 8, 128), lambda bi, ti: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        )(logits_cm, labels_p, mh, mw)
        lse = None
    else:
        h_pad = n_tiles * tile
        partials, lse = pl.pallas_call(
            functools.partial(_fwd_lse_kernel, tile=tile, h_out=h_out,
                              num_classes=cc),
            grid=(b, n_tiles),
            in_specs=_common_in_specs(hh, ww, cc, tile, w_out),
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda bi, ti: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, w_out), lambda bi, ti: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((b, h_pad, w_out), jnp.float32),
            ],
        )(logits_cm, labels_p, mh, mw)
    return jnp.sum(partials, axis=(1, 2)), (logits_cm, labels_p, mh, mw,
                                            lse)


def _fused_ce_fwd(logits, labels, out_hw, align_corners, tile):
    per_sample, res = _fwd_partials(logits, labels, out_hw, align_corners,
                                    tile)
    n = logits.shape[0] * out_hw[0] * out_hw[1]
    return jnp.sum(per_sample) / n, res


def _fused_ce_bwd(out_hw, align_corners, tile, res, g):
    logits_cm, labels_p, mh, mw, lse = res
    b, cc, hh, ww = logits_cm.shape
    h_out, w_out = out_hw
    n_tiles = mh.shape[0] // tile
    inv_n = 1.0 / (b * h_out * w_out)
    # lse is None when the forward ran in all-class mode; the routing must
    # agree with what the forward actually saved, not the current mode flag
    if lse is None:
        dlogits_cm = pl.pallas_call(
            functools.partial(_bwd_kernel, tile=tile, h_out=h_out,
                              num_classes=cc, inv_n=inv_n),
            grid=(b, n_tiles),
            in_specs=_common_in_specs(hh, ww, cc, tile, w_out),
            out_specs=pl.BlockSpec((1, cc, hh, ww),
                                   lambda bi, ti: (bi, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, cc, hh, ww), jnp.float32),
            scratch_shapes=[pltpu.VMEM((cc, tile, w_out), jnp.float32)],
        )(logits_cm, labels_p, mh, mw)
    else:
        cb = _pick_cb(cc)
        cc_pad = _round_up(cc, cb)
        lg = logits_cm
        if cc_pad != cc:
            lg = jnp.pad(logits_cm, ((0, 0), (0, cc_pad - cc), (0, 0),
                                     (0, 0)))
        dlogits_cm = pl.pallas_call(
            functools.partial(_bwd_cb_kernel, tile=tile, h_out=h_out,
                              cb=cb, inv_n=inv_n),
            grid=(b, cc_pad // cb, n_tiles),
            in_specs=[
                pl.BlockSpec((1, cb, hh, ww),
                             lambda bi, ci, ti: (bi, ci, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, w_out),
                             lambda bi, ci, ti: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, w_out),
                             lambda bi, ci, ti: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, hh), lambda bi, ci, ti: (ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, cb, hh, ww),
                                   lambda bi, ci, ti: (bi, ci, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, cc_pad, hh, ww),
                                           jnp.float32),
        )(lg, labels_p, lse, mh, mw)[:, :cc]
    # cotangent must match the primal logits dtype (bf16 on the hot path)
    dlogits = (jnp.transpose(dlogits_cm, (0, 2, 3, 1)) * g).astype(
        logits_cm.dtype)
    return dlogits, None


_fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


# scoped-VMEM budget for the EXTENDED class range (65..128, e.g. COCO's 81
# semantic classes): of the 32 MiB tpu_compiler_options scoped-vmem limit,
# leave headroom for Mosaic's own temporaries. The legacy <=64 range keeps
# its measured-good tiles unconditionally (VOC=21 tile 128: +0.5%, PERF.md).
_VMEM_BUDGET = 24 * 2 ** 20


def _bwd_vmem_bytes(cc, hh, ww, w_out, logits_itemsize, tile):
    """Scoped-VMEM working set of the CLASS-BLOCKED backward used for
    65..128 classes (_bwd_cb_kernel): only `cb` classes resident, labels +
    lse row tiles, no all-class scratch. Streamed blocks double-buffered.
    (The all-class _bwd_kernel working set grows ~C*h*w and measured 38.8 MB
    at C=81 inside the train step — that kernel stays <=64-class only.)"""
    cb = _pick_cb(cc)
    blocks = (cb * hh * ww * logits_itemsize   # logits class block
              + cb * hh * ww * 4               # dlogits class block
              + 2 * tile * w_out * 4           # labels + lse tiles
              + tile * hh * 4 + w_out * ww * 4)  # mh block + mw
    working = 8 * tile * w_out * 4
    return 2 * blocks + working


def default_tile(cc: int) -> int:
    """Row-tile sizes as measured (tile 128 at VOC's 21 classes: +0.5%;
    shrink with class count to keep per-class tiles in VMEM)."""
    return 128 if cc <= 32 else (64 if cc <= 64 else 32)


def forward_kernel_fits(cc, hh, ww, w_out, itemsize,
                        budget: int = _VMEM_BUDGET) -> bool:
    """Whether a FORWARD streaming kernel over class-major [C, hh, ww]
    logits producing w_out-wide row tiles (fused CE forward, eval
    confusion, upsample+argmax) fits the scoped-VMEM budget. Shared gate
    for the 65..128-class extension; <=64 classes always fits at the
    spatial sizes these models emit.

    The default budget is TPU-validated for forward-ONLY programs (the
    81-class 256^2 argmax shape compiled at ~23 MB naive). Gradient
    programs pass _VMEM_BUDGET_TRAIN, pinned to the largest working set
    chip-validated INSIDE a full train step (81@256^2, 23.0 MB naive,
    2.645x vs the XLA fallback — tools/bench_gate256.py): compiler stack
    accounting exceeds naive math by a kernel-dependent factor, so the
    train gate only admits shapes at or below an empirical compile."""
    if cc > 128:
        return False
    if cc <= 64:
        return True
    tile = default_tile(cc)
    fwd = (2 * (cc * hh * ww * itemsize + tile * w_out * 4
                + tile * hh * 4 + w_out * ww * 4)
           + 2 * tile * w_out * 4   # lse out tile (_fwd_lse_kernel)
           + 6 * tile * w_out * 4)
    return fwd <= budget


# train-path (grad) forward budget: see forward_kernel_fits docstring.
# Set to the LARGEST chip-validated in-step working set: 81 classes at
# 256^2 logits -> 512^2 labels (23.0 MB naive) compiled and ran inside the
# full UNet train step and beat the XLA fallback 2.645x (272 vs 103 img/s
# bs8 — tools/bench_gate256.py, PERF.md round 3). Shapes above this bound
# fall back to XLA: the compiler's stack accounting exceeds naive block
# math by a kernel-dependent factor (1.39x measured for this forward at
# the boundary, 1.7x for the retired all-class backward), so admitting
# anything bigger than what actually compiled would risk in-step Mosaic
# scoped-vmem failures against the 32 MiB tpu_compiler_options limit.
_VMEM_BUDGET_TRAIN = 22 * 2 ** 20


def fused_upsample_ce(logits, labels, align_corners: bool = True,
                      tile: int = 128, interpret: bool = False):
    """Drop-in for ops.loss.compute_loss on TPU when logits are at a lower
    resolution than labels. Falls back to the XLA path when fusion does not
    apply (same resolution, not on TPU and not interpreting, >128 classes,
    or a 65..128-class shape whose forward or class-blocked-backward
    working set cannot fit scoped VMEM)."""
    h_out, w_out = labels.shape[1], labels.shape[2]
    hh, ww = logits.shape[1], logits.shape[2]
    cc = logits.shape[-1]
    on_tpu = jax.devices()[0].platform == "tpu"
    # the kernels unroll the class loop: VOC=21 / colormap domain 32 /
    # COCO semantic 81; cap at the eval kernel's 128-lane limit.
    # 65..128 classes use the lse-residual forward + class-blocked backward
    # pair; require both working sets to fit scoped VMEM (the all-class
    # backward measured 38.8 MB at C=81 inside the train step — over the
    # 32 MiB limit — which is why it stays <=64-class only)
    tile = min(tile, default_tile(cc))
    too_many_classes = cc > 128
    if 64 < cc <= 128:
        if (not forward_kernel_fits(cc, hh, ww, w_out,
                                    logits.dtype.itemsize,
                                    budget=_VMEM_BUDGET_TRAIN)
                or _bwd_vmem_bytes(cc, hh, ww, w_out,
                                   logits.dtype.itemsize,
                                   tile) > _VMEM_BUDGET):
            too_many_classes = True
    if ((hh, ww) == (h_out, w_out) or too_many_classes
            or not (on_tpu or interpret)):
        return upsample_ce_reference(logits, labels, align_corners)
    if interpret:
        # exercised in tests via pltpu.force_tpu_interpret_mode()
        with pltpu.force_tpu_interpret_mode():
            return _fused_ce(logits, labels, (h_out, w_out), align_corners,
                             tile)
    return _fused_ce(logits, labels, (h_out, w_out), align_corners, tile)


def fused_upsample_ce_per_sample(logits, labels, align_corners: bool = True,
                                 tile: int = 128, interpret: bool = False):
    """Per-sample mean-CE vector [B] (forward only, no VJP) — lets eval mask
    padded duplicate samples out of the displayed loss while keeping the
    fused upsample+CE kernel (ops/pallas path of engine/steps.make_eval_step).
    Falls back to XLA when the fused kernel does not apply."""
    h_out, w_out = labels.shape[1], labels.shape[2]
    hh, ww = logits.shape[1], logits.shape[2]
    cc = logits.shape[-1]
    on_tpu = jax.devices()[0].platform == "tpu"
    tile = min(tile, default_tile(cc))
    # forward-only: no dlogits block / class scratch in the plan
    too_many_classes = not forward_kernel_fits(cc, hh, ww, w_out,
                                               logits.dtype.itemsize)
    if ((hh, ww) == (h_out, w_out) or too_many_classes
            or not (on_tpu or interpret)):
        from ..resize import resize_bilinear
        up = resize_bilinear(logits.astype(jnp.float32), (h_out, w_out),
                             align_corners=align_corners)
        lse = jax.nn.logsumexp(up, axis=-1)
        true_logit = jnp.take_along_axis(
            up, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
        return jnp.mean(lse - true_logit, axis=(1, 2))
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            sums, _ = _fwd_partials(logits, labels, (h_out, w_out),
                                    align_corners, tile, want_lse=False)
    else:
        sums, _ = _fwd_partials(logits, labels, (h_out, w_out),
                                align_corners, tile, want_lse=False)
    return sums / (h_out * w_out)
