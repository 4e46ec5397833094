"""Pallas TPU kernel: BN-apply + ReLU + 1x1-conv (matmul) + BN statistics,
in ONE pass over the activations.

Why: the DeepLabV3+ train step is BN-bandwidth-bound — convert+reduce
fusions (BatchNorm statistics) and multiply_add fusions (normalize) are
~65% of step time while MXU convolutions are ~3% (PERF.md). Every
ConvNormAct crosses HBM three extra times: the conv output is re-read for
statistics, re-read for normalization, and the normalized copy is written
again for the next conv. For 1x1 convolutions (2/3 of every ResNet
bottleneck, all of ASPP's pointwise branches) the conv is a plain matmul,
so both sides fuse into its epilogue/prologue:

    z = relu(x_raw * scale + shift)     # the PREVIOUS layer's BN-apply,
                                        # computed in-register on the tile
    y_raw = z @ W                       # MXU, f32 accumulate
    col_sum/col_sumsq of y_raw          # THIS layer's BN statistics,
                                        # accumulated in the epilogue

x_raw never needs a normalized copy in HBM and y_raw is never re-read for
statistics. The per-channel fold (scale = gamma*rsqrt(var+eps),
shift = beta - mean*scale) stays in plain JAX (tiny), so autodiff reaches
gamma/beta through this kernel's custom VJP.

The backward recomputes z and y_raw tile-wise (MXU is idle; FLOPs are free
relative to HBM) and runs as two kernels with opposite grid orders:
  bwd1 (j fastest): dz = sum_j dy_tot_j @ W_j^T accumulated in VMEM scratch,
       then dx = dz * relu' * scale plus dscale/dshift row-partials.
  bwd2 (i fastest): dW_j += z_i^T @ dy_tot_(i,j), accumulated in the output
       block (safe: the block index is constant over consecutive steps).
where dy_tot = dy + dsum + 2*y_raw*dsumsq folds the statistics cotangents
(the next layer's normalize depends on this layer's sums) into the matmul
cotangent.

Mosaic constraints honored (CLAUDE.md): strictly 2-D matmuls, no lane-dim
reshapes/transposes, (1, 8, lane) tiles for the per-grid-row statistic
partials, masking (not slicing) for the ragged final row-tile.

relu on the input is unconditional: every call site feeds either a post-relu
tensor (relu is then idempotent with scale=1/shift=0, and relu' has the same
zero set as the producing relu, so gradients are identical) or a raw conv
output whose BN+relu is exactly this prologue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_bn_act_matmul", "bn_act_matmul_reference"]


def _rows_valid(i, tn, k, n_valid):
    rows = jax.lax.broadcasted_iota(jnp.int32, (tn, k), 0) + i * tn
    return rows < n_valid


def _act(pre, act: str):
    """Static prologue activation: the PREVIOUS layer's nonlinearity."""
    if act == "relu":
        return jax.nn.relu(pre)
    if act == "relu6":
        return jnp.clip(pre, 0.0, jnp.asarray(6.0, pre.dtype))
    return pre  # 'none' — e.g. MobileNetV2 project outputs / residual sums


def _act_grad_mask(pre, act: str):
    if act == "relu":
        return pre > 0
    if act == "relu6":
        return (pre > 0) & (pre < 6)
    return pre == pre  # all-true


def bn_act_matmul_reference(x, scale, shift, w, act: str = "relu"):
    """Plain-XLA semantics (fallback + tests): z = act(x*scale+shift) in
    bf16 like BatchNorm2d's folded apply, y = z @ w with f32 accumulate,
    plus column sum / sum-of-squares of y."""
    cdt = x.dtype
    z = _act(x.astype(cdt) * scale.astype(cdt) + shift.astype(cdt), act)
    y = jax.lax.dot_general(z, w.astype(cdt), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.sum(y, axis=0)
    ss = jnp.sum(jnp.square(y), axis=0)
    return y.astype(cdt), s, ss


def _fwd_kernel(x_ref, scale_ref, shift_ref, w_ref, y_ref, stat_ref, *,
                tn: int, n_valid: int, out_dtype, act: str):
    i = pl.program_id(0)
    k = x_ref.shape[1]
    x = x_ref[...]
    cdt = x.dtype
    z = _act(x * scale_ref[...].astype(cdt)
             + shift_ref[...].astype(cdt), act)
    z = jnp.where(_rows_valid(i, tn, k, n_valid), z, jnp.zeros((), cdt))
    acc = jax.lax.dot_general(z, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    y_ref[...] = acc.astype(out_dtype)
    s = jnp.sum(acc, axis=0, keepdims=True)              # [1, tm]
    ss = jnp.sum(jnp.square(acc), axis=0, keepdims=True)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, acc.shape[1]), 1)
    stat_ref[...] = (jnp.where(sub == 0, s[None], 0.0)
                     + jnp.where(sub == 1, ss[None], 0.0))


def _dy_tot(dy_ref, dstat_ref, y2, valid):
    dsum = dstat_ref[0, 0:1, :]      # [1, tm]
    dsumsq = dstat_ref[0, 1:2, :]
    dy = dy_ref[...].astype(jnp.float32) + dsum + 2.0 * y2 * dsumsq
    return jnp.where(valid[:, :1], dy, 0.0)


def _bwd_dx_kernel(x_ref, scale_ref, shift_ref, w_ref, dy_ref, dstat_ref,
                   dx_ref, dss_ref, dz_acc, *, tn: int, n_valid: int,
                   n_j: int, in_dtype, act: str):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = x_ref.shape[1]

    @pl.when(j == 0)
    def _():
        dz_acc[...] = jnp.zeros_like(dz_acc)

    x = x_ref[...].astype(jnp.float32)
    scale = scale_ref[...].astype(jnp.float32)
    pre = x * scale + shift_ref[...].astype(jnp.float32)
    valid = _rows_valid(i, tn, k, n_valid)
    z = jnp.where(valid, _act(pre, act), 0.0)
    w = w_ref[...]
    y2 = jax.lax.dot_general(z.astype(w.dtype), w, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dy = _dy_tot(dy_ref, dstat_ref, y2, valid)
    dz_acc[...] += jax.lax.dot_general(
        dy.astype(w.dtype), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_j - 1)
    def _():
        mask = (valid & _act_grad_mask(pre, act)).astype(jnp.float32)
        dz = dz_acc[...] * mask
        dx_ref[...] = (dz * scale).astype(in_dtype)
        # out-of-bounds rows of x are garbage (possibly NaN): 0*NaN = NaN,
        # so select, don't rely on the mask product
        xm = jnp.where(valid, x, 0.0)
        dsc = jnp.sum(dz * xm, axis=0, keepdims=True)   # [1, K]
        dsh = jnp.sum(dz, axis=0, keepdims=True)
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, k), 1)
        dss_ref[...] = (jnp.where(sub == 0, dsc[None], 0.0)
                        + jnp.where(sub == 1, dsh[None], 0.0))


def _bwd_dw_kernel(x_ref, scale_ref, shift_ref, w_ref, dy_ref, dstat_ref,
                   dw_ref, *, tn: int, n_valid: int, act: str):
    i = pl.program_id(1)  # grid = (n_j, n_i): i is the FAST axis
    k = x_ref.shape[1]

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    x = x_ref[...]
    cdt = x.dtype
    pre = x * scale_ref[...].astype(cdt) + shift_ref[...].astype(cdt)
    valid = _rows_valid(i, tn, k, n_valid)
    z = jnp.where(valid, _act(pre, act), jnp.zeros((), cdt))
    w = w_ref[...]
    y2 = jax.lax.dot_general(z, w, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dy = _dy_tot(dy_ref, dstat_ref, y2, valid)
    dw_ref[...] += jax.lax.dot_general(z, dy.astype(cdt),
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)


def _specs(tn, k, tm, order):
    """in_specs shared by all three kernels. order='ij' (i slow) or 'ji'."""
    if order == "ij":
        xi = lambda i, j: (i, 0)
        wi = lambda i, j: (0, j)
        yi = lambda i, j: (i, j)
        sti = lambda i, j: (0, 0, j)
    else:  # grid (n_j, n_i)
        xi = lambda j, i: (i, 0)
        wi = lambda j, i: (0, j)
        yi = lambda j, i: (i, j)
        sti = lambda j, i: (0, 0, j)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)  # [1, K] scale/shift, whole
    return {
        "x": pl.BlockSpec((tn, k), xi, memory_space=pltpu.VMEM),
        "scale": vec, "shift": vec,
        "w": pl.BlockSpec((k, tm), wi, memory_space=pltpu.VMEM),
        "y": pl.BlockSpec((tn, tm), yi, memory_space=pltpu.VMEM),
        "stat": pl.BlockSpec((1, 8, tm), sti, memory_space=pltpu.VMEM),
    }


def _tiles(n, k, m, tn):
    n_i = pl.cdiv(n, tn)
    tm = m if m <= 512 else 512
    assert m % tm == 0, (m, tm)
    n_j = m // tm
    return n_i, n_j, tm


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused(x, scale, shift, w, tn, interpret, act):
    out, _ = _fused_fwd(x, scale, shift, w, tn, interpret, act)
    return out


def _fused_fwd(x, scale, shift, w, tn, interpret, act):
    n, k = x.shape
    m = w.shape[1]
    tn = tn[0] if isinstance(tn, tuple) else tn
    n_i, n_j, tm = _tiles(n, k, m, tn)
    sp = _specs(tn, k, tm, "ij")
    scale2 = scale.reshape(1, k).astype(jnp.float32)
    shift2 = shift.reshape(1, k).astype(jnp.float32)
    wc = w.astype(x.dtype)
    y, stats = pl.pallas_call(
        functools.partial(_fwd_kernel, tn=tn, n_valid=n, out_dtype=x.dtype,
                          act=act),
        grid=(n_i, n_j),
        in_specs=[sp["x"], sp["scale"], sp["shift"], sp["w"]],
        out_specs=[sp["y"],
                   pl.BlockSpec((1, 8, tm), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n, m), x.dtype),
                   jax.ShapeDtypeStruct((n_i, 8, m), jnp.float32)],
        interpret=interpret,
    )(x, scale2, shift2, wc)
    s = jnp.sum(stats[:, 0, :], axis=0)
    ss = jnp.sum(stats[:, 1, :], axis=0)
    return (y, s, ss), (x, scale2, shift2, wc)


def _fused_bwd(tn, interpret, act, res, cts):
    x, scale2, shift2, wc = res
    dy, dsum, dsumsq = cts
    n, k = x.shape
    m = wc.shape[1]
    tn = tn[1] if isinstance(tn, tuple) else tn
    n_i, n_j, tm = _tiles(n, k, m, tn)
    # statistic cotangents, broadcast per M-tile: [1, 8, M] rows 0/1
    dstat = jnp.concatenate(
        [dsum.reshape(1, 1, m).astype(jnp.float32),
         dsumsq.reshape(1, 1, m).astype(jnp.float32),
         jnp.zeros((1, 6, m), jnp.float32)], axis=1)
    dy = dy.astype(x.dtype)

    sp = _specs(tn, k, tm, "ij")
    dx, dss = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, tn=tn, n_valid=n, n_j=n_j,
                          in_dtype=x.dtype, act=act),
        grid=(n_i, n_j),
        in_specs=[sp["x"], sp["scale"], sp["shift"], sp["w"], sp["y"],
                  sp["stat"]],
        out_specs=[pl.BlockSpec((tn, k), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, k), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n, k), x.dtype),
                   jax.ShapeDtypeStruct((n_i, 8, k), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tn, k), jnp.float32)],
        interpret=interpret,
    )(x, scale2, shift2, wc, dy, dstat)

    spj = _specs(tn, k, tm, "ji")
    dw = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, tn=tn, n_valid=n, act=act),
        grid=(n_j, n_i),
        in_specs=[spj["x"], spj["scale"], spj["shift"], spj["w"], spj["y"],
                  spj["stat"]],
        out_specs=pl.BlockSpec((k, tm), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, m), jnp.float32),
        interpret=interpret,
    )(x, scale2, shift2, wc, dy, dstat)

    dscale = jnp.sum(dss[:, 0, :], axis=0)
    dshift = jnp.sum(dss[:, 1, :], axis=0)
    return dx, dscale, dshift, dw


_fused.defvjp(_fused_fwd, _fused_bwd)


def _auto_tn(k: int, m: int) -> tuple:
    """(fwd_tn, bwd_tn) row-tile heights. Big tiles amortize the ~us
    per-grid-step cost (a 1000-step grid costs ~2 ms in overhead alone);
    VMEM bounds them: the bwd kernel holds x (tn,K) bf16 + dz scratch
    (tn,K) f32 + dx (tn,K) + recomputed y2 (tn,tm) f32 + dy (tn,tm), all
    inside the 16 MB scoped limit incl. double buffering (measured: tn=512
    @ K=2048 OOMs; these budgets reproduce the configs that compile)."""
    tm = min(m, 512)
    # fwd holds x (tn,K) bf16 + y (tn,tm) bf16 + f32 acc (tn,tm), all
    # double-buffered by the pipeline (measured: the 8 MB budget OOM'd at
    # K=2048/tm=512 with w buffers on top)
    fwd = max(256, min(4096 if k + tm <= 512 else 2048,
                       (4 << 20) // (2 * k + 6 * tm) // 128 * 128))
    bwd = max(128, min(1024, (4 << 20) // (8 * (k + tm)) // 128 * 128))
    return fwd, bwd


def fused_bn_act_matmul(x, scale, shift, w, tn: int | None = None,
                        interpret: bool = False, act: str = "relu"):
    """act(x*scale+shift) @ w with fused output BN statistics
    (act: 'relu' | 'relu6' | 'none' — the previous layer's nonlinearity).

    x: [N, K] (or [..., K], flattened internally) compute-dtype;
    scale/shift: [K] f32 (per-channel BN fold of the PREVIOUS layer);
    w: [K, M]. Returns (y [N-or-orig-shape, M] x.dtype, col_sum [M] f32,
    col_sumsq [M] f32).

    Falls back to the XLA reference off-TPU (same math, one extra pass).
    """
    orig_shape = x.shape
    k = orig_shape[-1]
    if tn is None:
        tn = _auto_tn(k, w.shape[1])
    x2 = x.reshape(-1, k)
    on_tpu = jax.devices()[0].platform == "tpu"
    if not (on_tpu or interpret):
        y, s, ss = bn_act_matmul_reference(x2, scale, shift, w, act)
    else:
        y, s, ss = _fused(x2, scale, shift, w, tn, interpret, act)
    return y.reshape(orig_shape[:-1] + (w.shape[1],)), s, ss
