"""Jitted train / eval steps.

The steps are written as *global* functions over the full batch; under a
data-parallel mesh the batch arrives sharded on its leading axis and XLA's
SPMD partitioner emits the gradient all-reduce (and BN-stat reductions) over
ICI — the TPU-native equivalent of DDP's NCCL ring-allreduce inside
pytorch_modules.Trainer (SURVEY.md §2.3).

Gradient accumulation (reference --accumulate, train.py:94) is a
`jax.lax.scan` over microbatch slices inside one jitted step: grads are
accumulated in f32 and a single optimizer update is applied — matching the
reference's every-k-batches update semantics while keeping the whole thing
one XLA program.

Eval masks padded samples (static-shape batches; see data/loader.py) before
loss/metric accumulation, so padded duplicates never contaminate metrics.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops.loss import compute_loss
from ..ops.resize import resize_bilinear

__all__ = ["TrainState", "make_train_step", "make_eval_step", "create_train_state"]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def create_train_state(model, rng, sample_input, tx) -> TrainState:
    # jitted init: one compiled program instead of thousands of eager
    # dispatches (matters on TPU startup and enormously on small hosts)
    init_fn = jax.jit(lambda rng, x: model.init({"params": rng}, x,
                                                train=False))
    variables = init_fn(rng, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def make_train_step(loss_fn: Callable = compute_loss, accumulate: int = 1,
                    donate: bool = True):
    """Returns jitted (state, images, segs) -> (state, loss).

    images: [B, H, W, 3] normalized float; segs: [B, H, W] int32.
    B must be divisible by `accumulate`; each microbatch is B/accumulate.
    """
    accumulate = max(1, int(accumulate))

    def microbatch_loss(params, batch_stats, apply_fn, images, segs):
        logits, mutated = apply_fn(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"])
        loss = loss_fn(logits, segs)
        return loss, mutated["batch_stats"]

    def step(state: TrainState, images, segs):
        grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)
        if accumulate == 1:
            (loss, new_bs), grads = grad_fn(state.params, state.batch_stats,
                                            state.apply_fn, images, segs)
        else:
            b = images.shape[0]
            mb = b // accumulate
            images_m = images[:mb * accumulate].reshape(
                (accumulate, mb) + images.shape[1:])
            segs_m = segs[:mb * accumulate].reshape(
                (accumulate, mb) + segs.shape[1:])

            def scan_body(carry, xs):
                grads_acc, loss_acc, bs = carry
                imgs_i, segs_i = xs
                (loss_i, bs_new), grads_i = grad_fn(
                    state.params, bs, state.apply_fn, imgs_i, segs_i)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads_i)
                return (grads_acc, loss_acc + loss_i, bs_new), None

            zero_grads = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (grads, loss_sum, new_bs), _ = jax.lax.scan(
                scan_body, (zero_grads, jnp.zeros((), jnp.float32),
                            state.batch_stats), (images_m, segs_m))
            grads = jax.tree.map(lambda g: g / accumulate, grads)
            loss = loss_sum / accumulate
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return state, loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(num_classes: int, align_corners: bool = True,
                   use_pallas: bool = True):
    """Returns jitted (state, images, segs, valid) -> (loss, tp, fn, fp)
    with padded samples masked out of the confusion counts.

    `valid` is the count of real samples in the batch; padded tail samples
    (duplicates of real ones) are excluded from the confusion counts. On TPU
    with low-res logits, the upsample+argmax+confusion and the upsample+CE
    are fused Pallas kernels that never materialize full-res logits
    (ops/pallas/); the padded duplicates then contribute to the displayed
    loss (a progress indicator) but never to the metrics.
    """

    def step(state: TrainState, images, segs, valid):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        th, tw = segs.shape[1], segs.shape[2]
        hh, ww = logits.shape[1], logits.shape[2]
        on_tpu = jax.devices()[0].platform == "tpu"
        if (use_pallas and on_tpu and (hh, ww) != (th, tw)
                and num_classes <= 64):
            from ..ops.pallas.eval_confusion import fused_eval_confusion
            from ..ops.pallas.softmax_ce import fused_upsample_ce
            loss = fused_upsample_ce(logits, segs,
                                     align_corners=align_corners)
            tp, fn, fp = fused_eval_confusion(logits, segs, valid,
                                              align_corners=align_corners)
            return loss, tp, fn, fp

        b = images.shape[0]
        sample_mask = (jnp.arange(b) < valid)
        # loss over valid samples only (per-sample CE, then masked mean)
        up = resize_bilinear(logits.astype(jnp.float32), (th, tw),
                             align_corners=align_corners)
        lse = jax.nn.logsumexp(up, axis=-1)
        true_logit = jnp.take_along_axis(
            up, segs[..., None].astype(jnp.int32), axis=-1)[..., 0]
        per_sample = jnp.mean(lse - true_logit, axis=(1, 2))
        loss = jnp.sum(per_sample * sample_mask) / jnp.maximum(
            jnp.sum(sample_mask), 1.0)
        pred = jnp.argmax(up, axis=-1).astype(jnp.int32)
        # mask padded samples into an out-of-range bucket excluded by bincount
        pred_m = jnp.where(sample_mask[:, None, None], pred, num_classes)
        segs_m = jnp.where(sample_mask[:, None, None], segs, num_classes)
        # confusion over (num_classes+1)^2 then crop the padding bucket
        p = pred_m.reshape(-1)
        t = segs_m.reshape(-1)
        nc1 = num_classes + 1
        cm = jnp.bincount(t * nc1 + p, length=nc1 * nc1).reshape(nc1, nc1)
        cm = cm[:num_classes, :num_classes].astype(jnp.float32)
        tp = jnp.diagonal(cm)
        fn = jnp.sum(cm, axis=1) - tp
        fp = jnp.sum(cm, axis=0) - tp
        return loss, tp, fn, fp

    return jax.jit(step)


def make_predict_step(align_corners: bool = True):
    """(state, images, out_hw) -> argmax mask at out_hw (for show_batch)."""

    def predict(state: TrainState, images, out_hw):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        up = resize_bilinear(logits.astype(jnp.float32), out_hw,
                             align_corners=align_corners)
        return jnp.argmax(up, axis=-1).astype(jnp.int32)

    return jax.jit(predict, static_argnums=(2,))
