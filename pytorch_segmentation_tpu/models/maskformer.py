"""MaskFormer — mask-classification segmentation (Cheng et al., NeurIPS
2021, arXiv:2107.06278) — a model family BEYOND the reference
(WoodsGao/pytorch_segmentation is per-pixel-CE only; this brings the
set-prediction paradigm), built from the framework's own blocks so every
subsystem (eval engine, serving, export, EMA/TTA, porting, remat)
composes.

Architecture (the paper's semantic configuration, TPU-first):
  - ResNet backbone (os=32 feature pyramid, nn/backbones/resnet.py);
  - pixel decoder: the FPN top-down pathway (models/fpn.py conventions —
    1x1 linear laterals + nearest x2 + 3x3 smooth; BN in place of the
    paper's GroupNorm, the framework-wide norm) ending in a stride-4
    per-pixel embedding map [B, H/4, W/4, mask_dim];
  - transformer decoder: Q=100 learned queries, 6 post-norm DETR layers
    (self-attn, cross-attn into the C5 token sequence + fixed 2-D sine
    positional encodings, FFN) — plain attention only, nothing
    deformable (TPU-hostile);
  - heads: class MLP -> K+1 logits (incl. "no object"); 3-layer mask
    MLP -> mask embedding; mask logits = one [B,Q,mask_dim] x
    [B,H/4,W/4,mask_dim] MXU einsum.

Static set-prediction on TPU: for SEMANTIC segmentation the ground
truth is at most one binary mask per class, so targets are a fixed
[B, K, h, w] one-hot stack with a [B, K] presence gate — no dynamic
shapes anywhere. Train-mode forward returns {"cls", "mask"} (a dict, so
the engine's aux-tuple contract is untouched) consumed by
make_maskformer_loss; eval-mode forward returns ordinary semantic
logits via the paper's inference rule sum_q p_q(c) * sigmoid(mask_q) —
so test.py / inference.py / serve.py / export compose unchanged.

Matching: the bipartite query<->class assignment runs ON DEVICE as
entropy-regularized OT (Sinkhorn over the [Q, K+dummy] cost matrix,
fixed iteration count, f32) with per-class argmax decode — fully
jittable, no host round-trip. matcher='hungarian' instead calls
scipy.optimize.linear_sum_assignment through jax.pure_callback (exact,
but a host sync inside the step). NOTE: the tunneled axon PJRT runtime
does not implement host callbacks at all ("axon_pjrt does not support
host send/recv callbacks"), so on this environment's TPU the Sinkhorn
matcher is not merely faster — it is the only runnable option; the
Hungarian path works on CPU and standard TPU runtimes and anchors the
Sinkhorn optimality tests (tests/test_maskformer.py). Costs and losses
follow the paper: lambda_cls 1 / focal 20 / dice 1, no-object 0.1.
On-chip: 264.5 img/s train @512^2 bf16 bs32 (tools/bench_models.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.backbones.resnet import ResNet
from ..nn.blocks import ConvNormAct, conv_kernel_init
from ..ops.resize import resize_bilinear, resize_nearest

__all__ = ["MaskFormer", "make_maskformer_loss"]


def _sine_pos_embed(h, w, dim, dtype):
    """DETR's fixed 2-D sine positional encoding, [h*w, dim]."""
    half = dim // 2
    y = np.arange(h, dtype=np.float32)[:, None]
    x = np.arange(w, dtype=np.float32)[None, :]
    omega = 1.0 / (10000.0 ** (np.arange(half // 2, dtype=np.float32)
                               / (half // 2)))
    out = []
    for pos in (np.broadcast_to(y, (h, w)), np.broadcast_to(x, (h, w))):
        ang = pos[..., None] * omega
        out.append(np.sin(ang))
        out.append(np.cos(ang))
    pe = np.concatenate(out, -1).reshape(h * w, 2 * (half // 2) * 2)
    if pe.shape[-1] < dim:
        pe = np.pad(pe, ((0, 0), (0, dim - pe.shape[-1])))
    return jnp.asarray(pe[:, :dim], dtype)


class _MHA(nn.Module):
    """Plain multi-head attention (separate q/k/v/proj Linears — the
    torch mirror uses the same separate-projection layout, NOT
    nn.MultiheadAttention's packed in-proj) with DETR's additive
    positional terms on query/key only."""
    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, q, k, v, q_pos=None, k_pos=None):
        b, nq, _ = q.shape
        nk = k.shape[1]
        hd = self.dim // self.heads
        dense = functools.partial(nn.Dense, dtype=self.dtype,
                                  param_dtype=jnp.float32)
        qi = q if q_pos is None else q + q_pos
        ki = k if k_pos is None else k + k_pos
        qh = dense(self.dim, name="q")(qi).reshape(b, nq, self.heads, hd)
        kh = dense(self.dim, name="k")(ki).reshape(b, nk, self.heads, hd)
        vh = dense(self.dim, name="v")(v).reshape(b, nk, self.heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh * (hd ** -0.5), kh)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self.dtype), vh)
        return dense(self.dim, name="proj")(y.reshape(b, nq, self.dim))


class _DecoderLayer(nn.Module):
    """DETR post-norm decoder layer: each sublayer is x + f(x) -> LN."""
    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, q, mem, q_pos, m_pos):
        ln = functools.partial(nn.LayerNorm, epsilon=1e-5,
                               dtype=self.dtype, param_dtype=jnp.float32)
        q = ln(name="ln1")(q + _MHA(self.dim, self.heads, self.dtype,
                                    name="self_attn")(
            q, q, q, q_pos=q_pos, k_pos=q_pos))
        q = ln(name="ln2")(q + _MHA(self.dim, self.heads, self.dtype,
                                    name="cross_attn")(
            q, mem, mem, q_pos=q_pos, k_pos=m_pos))
        h = nn.Dense(4 * self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(q)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(nn.relu(h))
        return ln(name="ln3")(q + h)


class MaskFormer(nn.Module):
    num_classes: int
    backbone_layers: tuple = (3, 4, 6, 3)  # ResNet-50
    block: str = "bottleneck"
    num_queries: int = 100
    dim: int = 256         # transformer width
    mask_dim: int = 256    # per-pixel embedding width
    heads: int = 8
    dec_layers: int = 6
    fpn_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None
    # full_res_output=False returns stride-4 semantic scores in eval mode
    # (deferred trailing upsample, consumed by the fused eval kernels)
    full_res_output: bool = True
    up_align_corners: bool = False
    output_stride: int = 4
    remat: bool = False
    # aux_loss=True (the paper's training recipe) additionally returns
    # per-decoder-layer predictions from the SHARED heads in train mode
    # ("aux_cls"/"aux_mask", stacked over the first dec_layers-1 layers);
    # make_maskformer_loss applies the full matched loss to each
    # (deep supervision, arXiv:2107.06278 app. — as in DETR)
    aux_loss: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNet(block=self.block, layers=self.backbone_layers,
                       dtype=self.dtype, axis_name=self.axis_name,
                       remat=self.remat,
                       name="backbone")(x, train=train)[1:]  # C2..C5
        sizes = [f.shape[1:3] for f in feats]

        def cna(ch, k, name, act=nn.relu):
            return ConvNormAct(ch, kernel_size=k, activate=act,
                               dtype=self.dtype, axis_name=self.axis_name,
                               name=name)

        # ---- pixel decoder (FPN top-down, models/fpn.py conventions) --
        p = cna(self.fpn_channels, 1, "lat3", act=None)(feats[3],
                                                        train=train)
        pyramid = [p]
        for i in (2, 1, 0):
            lat = cna(self.fpn_channels, 1, f"lat{i}", act=None)(
                feats[i], train=train)
            p = lat + resize_nearest(p, sizes[i])
            pyramid.insert(0, p)
        emb = cna(self.fpn_channels, 3, "pix0")(pyramid[0], train=train)
        pixel_emb = nn.Conv(self.mask_dim, (3, 3), padding=1,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=conv_kernel_init,
                            name="pixel_proj")(emb)      # [B, H/4, W/4, D]

        # ---- transformer decoder over C5 tokens ----------------------
        c5 = feats[3]
        b, h5, w5, _ = c5.shape
        mem = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, kernel_init=conv_kernel_init,
                      name="input_proj")(c5).reshape(b, h5 * w5, self.dim)
        m_pos = _sine_pos_embed(h5, w5, self.dim, self.dtype)[None]
        q_emb = self.param("query_embed",
                           nn.initializers.normal(1.0),
                           (self.num_queries, self.dim), jnp.float32)
        q_pos = q_emb.astype(self.dtype)[None]
        # ---- shared heads (applied to every supervised layer) --------
        dense = functools.partial(nn.Dense, dtype=self.dtype,
                                  param_dtype=jnp.float32)
        dec_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                param_dtype=jnp.float32, name="dec_norm")
        cls_head = dense(self.num_classes + 1, name="cls_head")
        mlp0 = dense(self.dim, name="mask_mlp0")
        mlp1 = dense(self.dim, name="mask_mlp1")
        mlp2 = dense(self.mask_dim, name="mask_mlp2")

        def heads(qn):
            cl = cls_head(qn)
            e = mlp2(nn.relu(mlp1(nn.relu(mlp0(qn)))))
            ml = jnp.einsum("bqc,bhwc->bqhw", e, pixel_emb)
            return cl.astype(jnp.float32), ml.astype(jnp.float32)

        q = jnp.zeros((b, self.num_queries, self.dim), self.dtype)
        aux = []
        for i in range(self.dec_layers):
            q = _DecoderLayer(self.dim, self.heads, self.dtype,
                              name=f"dec{i}")(q, mem, q_pos, m_pos)
            if train and self.aux_loss and i < self.dec_layers - 1:
                aux.append(heads(dec_norm(q)))
        q = dec_norm(q)
        cls_logits, mask_logits = heads(q)

        if train:
            out = {"cls": cls_logits, "mask": mask_logits}
            if aux:
                out["aux_cls"] = jnp.stack([a[0] for a in aux])
                out["aux_mask"] = jnp.stack([a[1] for a in aux])
            return out

        # ---- semantic inference (paper eq. of §3.4) ------------------
        p_cls = jax.nn.softmax(cls_logits.astype(jnp.float32),
                               -1)[..., :self.num_classes]
        m = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
        sem = jnp.einsum("bqc,bqhw->bhwc", p_cls, m)
        if self.full_res_output:
            sem = resize_bilinear(sem, (4 * sem.shape[1], 4 * sem.shape[2]),
                                  align_corners=self.up_align_corners)
        return sem


# ---------------------------------------------------------------------------
# set-prediction loss (matching + cls CE + focal + dice)
# ---------------------------------------------------------------------------

def _sinkhorn_assign(cost, present, iters=50, eps=0.05):
    """Device matcher: entropy-regularized OT on [B, Q, C] costs with a
    dummy column absorbing the unmatched-query mass, then per-present-
    class argmax decode. Returns one-hot assignment [B, C, Q]."""
    b, nq, nc = cost.shape
    big = 1e4
    cost = jnp.where(present[:, None, :], cost, big)
    # dummy column: zero cost, mass Q - n_present
    cost_a = jnp.concatenate([cost, jnp.zeros((b, nq, 1))], -1)
    npres = jnp.sum(present, -1, keepdims=True).astype(jnp.float32)
    col_mass = jnp.concatenate(
        [jnp.where(present, 1.0, 0.0), nq - npres], -1)     # [B, C+1]
    logk = -cost_a / eps
    u = jnp.zeros((b, nq))
    lc = jnp.log(jnp.maximum(col_mass, 1e-9))

    def body(carry, _):
        u, v = carry
        # column update then row update (log-domain balancing)
        v = lc - jax.nn.logsumexp(logk + u[..., None], axis=1)
        u = -jax.nn.logsumexp(logk + v[:, None, :], axis=2)  # rows mass 1
        return (u, v), None

    (u, v), _ = jax.lax.scan(body, (u, jnp.zeros_like(lc)), None,
                             length=iters)
    logp = logk + u[..., None] + v[:, None, :]
    qstar = jnp.argmax(logp[..., :nc], axis=1)               # [B, C]
    asgn = jax.nn.one_hot(qstar, nq, dtype=jnp.float32)      # [B, C, Q]
    return asgn * present[..., None]


def _hungarian_assign(cost, present):
    """Host matcher: exact scipy linear_sum_assignment via pure_callback
    (one host sync per step — the measured tradeoff vs Sinkhorn)."""
    def host(cost, present):
        from scipy.optimize import linear_sum_assignment
        b, nq, nc = cost.shape
        out = np.zeros((b, nc, nq), np.float32)
        for i in range(b):
            cols = np.nonzero(present[i])[0]
            if len(cols) == 0:
                continue
            r, c = linear_sum_assignment(cost[i][:, cols])
            out[i, cols[c], r] = 1.0
        return out

    b, nq, nc = cost.shape
    return jax.pure_callback(
        host, jax.ShapeDtypeStruct((b, nc, nq), jnp.float32),
        cost, present, vmap_method="sequential")


def make_maskformer_loss(num_classes: int, matcher: str = "sinkhorn",
                         w_cls: float = 1.0, w_focal: float = 20.0,
                         w_dice: float = 1.0, eos_coef: float = 0.1,
                         focal_alpha: float = 0.25,
                         focal_gamma: float = 2.0):
    """loss_fn(outputs, segs) for make_train_step: Hungarian/Sinkhorn
    matching on the paper's lambda-weighted costs, then class CE over all
    queries (matched class or no-object at eos_coef) + sigmoid focal +
    dice on the matched masks. Targets are built statically: one binary
    mask per class with a presence gate (semantic set prediction)."""

    def one_layer(cls, mask, onehot, present, tsum, valid, nvalid):
        """Matched set loss for ONE prediction layer (shared by the final
        output and every deep-supervision layer — each layer is matched
        independently, as in DETR/MaskFormer)."""
        logp = jax.nn.log_softmax(cls, -1)                  # [B,Q,K+1]
        m = jax.nn.sigmoid(mask)
        # focal terms, decomposed so the [B,Q,C] cost needs only einsums:
        #   focal_pos = alpha * (1-m)^g * -log(m); focal_neg analogous.
        # Ignored pixels (label >= num_classes, e.g. 255) are excluded
        # from every pixel sum via `valid` — they are neither positives
        # (all-zero one-hot) nor negatives (masked fneg/denominators).
        fpos = -focal_alpha * ((1 - m) ** focal_gamma) \
            * jnp.log(jnp.clip(m, 1e-8))
        fneg = -(1 - focal_alpha) * (m ** focal_gamma) \
            * jnp.log(jnp.clip(1 - m, 1e-8)) * valid[:, None]
        inter = jnp.einsum("bqhw,bhwc->bqc", m * valid[:, None], onehot)
        pos = jnp.einsum("bqhw,bhwc->bqc", fpos, onehot)
        neg = (jnp.sum(fneg, (2, 3))[..., None]
               - jnp.einsum("bqhw,bhwc->bqc", fneg, onehot))
        focal_qc = (pos + neg) / nvalid[:, None, None]
        dice_qc = 1.0 - (2 * inter + 1.0) / (
            jnp.sum(m * valid[:, None], (2, 3))[..., None]
            + tsum[:, None, :] + 1.0)
        cost = (w_cls * (-jnp.exp(logp[..., :num_classes]))
                + w_focal * focal_qc + w_dice * dice_qc)

        match = _hungarian_assign if matcher == "hungarian" \
            else _sinkhorn_assign
        asgn = jax.lax.stop_gradient(
            match(jax.lax.stop_gradient(cost), present))    # [B, C, Q]

        n_match = jnp.maximum(jnp.sum(asgn), 1.0)
        # class CE over every query: matched -> its class, else no-object
        # (weight eos_coef) — the DETR/MaskFormer classification loss.
        # `matched` is clamped to [0,1]: a (rare) Sinkhorn decode
        # collision would otherwise drive 1-matched negative and flip the
        # sign of the no-object term.
        q_cls_logp = jnp.einsum("bcq,bqc->bq", asgn,
                                logp[..., :num_classes])
        matched = jnp.minimum(jnp.sum(asgn, 1), 1.0)        # [B, Q] 0/1
        ce = -(q_cls_logp + (1 - matched) * eos_coef
               * logp[..., num_classes])
        denom = jnp.sum(matched) + eos_coef * jnp.sum(1 - matched)
        loss_cls = jnp.sum(ce) / jnp.maximum(denom, 1.0)

        # mask losses on matched pairs (selection via the one-hot matmul
        # keeps everything static-shaped; gradients flow through m)
        gate = asgn  # [B, C, Q], zero rows for absent classes
        focal_m = jnp.einsum("bcq,bqc->bc", gate, focal_qc)
        dice_m = jnp.einsum("bcq,bqc->bc", gate, dice_qc)
        loss_mask = (w_focal * jnp.sum(focal_m)
                     + w_dice * jnp.sum(dice_m)) / n_match
        return w_cls * loss_cls + loss_mask

    def loss_fn(outputs, segs):
        cls, mask = outputs["cls"], outputs["mask"]     # f32
        b, nq, hh, ww = mask.shape
        # stride-aligned order-0 target subsample (mask stride vs labels)
        sy, sx = segs.shape[1] // hh, segs.shape[2] // ww
        tgt = segs[:, ::sy, ::sx][:, :hh, :ww]
        onehot = jax.nn.one_hot(tgt, num_classes,
                                dtype=jnp.float32)          # [B,h,w,C]
        valid = (tgt < num_classes).astype(jnp.float32)     # [B,h,w]
        nvalid = jnp.maximum(jnp.sum(valid, (1, 2)), 1.0)   # [B]
        present = jnp.sum(onehot, (1, 2)) > 0               # [B, C]
        tsum = jnp.sum(onehot, (1, 2))                      # [B, C]

        total = one_layer(cls, mask, onehot, present, tsum, valid, nvalid)
        if "aux_cls" in outputs:
            # deep supervision: the full matched loss at every decoder
            # layer, unit weight each (the paper's recipe)
            for i in range(outputs["aux_cls"].shape[0]):
                total = total + one_layer(outputs["aux_cls"][i],
                                          outputs["aux_mask"][i],
                                          onehot, present, tsum, valid,
                                          nvalid)
        return total

    return loss_fn
