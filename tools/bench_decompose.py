#!/usr/bin/env python3
"""Decompose the bench train-step time: forward / forward+backward /
full step (SGD+momentum) / full step (plain SGD) / XLA-loss step.

All variants run in ONE process (per-process TPU warmup is ~5 min) and each
timing chains reps through donated state / dependent outputs, synced by a
host read (CLAUDE.md: block_until_ready is unreliable on this runtime).
"""

import time

import jax
import jax.numpy as jnp
import optax

from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import DeepLabV3Plus
from pytorch_segmentation_tpu.ops.loss import make_loss_fn
from pytorch_segmentation_tpu.utils.runtime import setup_runtime


def timeit(label, fn, state, images, segs, reps=10):
    # donating steps consume the input state's buffers: never reuse `state`
    # after the first call — keep chaining s
    s = state
    for _ in range(3):
        s, loss = fn(s, images, segs)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(reps):
        s, loss = fn(s, images, segs)
    float(loss)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:42s} {dt * 1e3:8.2f} ms/step  "
          f"{images.shape[0] / dt:7.1f} img/s", flush=True)
    return dt


def main():
    setup_runtime()
    on_tpu = jax.devices()[0].platform == "tpu"
    img = 513 if on_tpu else 129
    bs = 32 if on_tpu else 4
    model = DeepLabV3Plus(num_classes=21, dtype=jnp.bfloat16,
                          full_res_output=not on_tpu)
    images = jax.random.normal(jax.random.PRNGKey(1), (bs, img, img, 3),
                               jnp.float32)
    segs = jnp.zeros((bs, img, img), jnp.int32)
    pallas_loss = make_loss_fn(align_corners=True, use_pallas=on_tpu)
    xla_loss = make_loss_fn(align_corners=True, use_pallas=False)

    def fresh(tx):
        return create_train_state(model, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 64, 64, 3), jnp.float32), tx)

    state = fresh(optax.sgd(1e-3, momentum=0.9))

    # forward + loss only (train-mode BN, chained via loss -> next scale)
    @jax.jit
    def fwd_only(state, images, segs):
        logits, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=True, mutable=["batch_stats"])
        loss = pallas_loss(logits, segs)
        return state, loss

    # forward+backward, no optimizer: fold grads into a scalar the next
    # call's input depends on (prevents dead-code elim of the backward)
    def grads_only_make(loss_fn):
        def batch_loss(params, batch_stats, images, segs):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": batch_stats},
                images, train=True, mutable=["batch_stats"])
            return loss_fn(logits, segs), mutated["batch_stats"]

        @jax.jit
        def f(st, images, segs):
            (loss, new_bs), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(st.params, st.batch_stats,
                                          images, segs)
            gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            return st.replace(batch_stats=new_bs), loss + 0.0 * gsum
        return f

    timeit("forward only (train BN)", fwd_only, state, images, segs)
    timeit("forward+backward (no opt)", grads_only_make(pallas_loss),
           state, images, segs)
    step_m = make_train_step(loss_fn=pallas_loss, accumulate=1)
    timeit("full step SGD+momentum (bench)", step_m, state, images, segs)
    state_nm = fresh(optax.sgd(1e-3))
    step_nm = make_train_step(loss_fn=pallas_loss, accumulate=1)
    timeit("full step SGD no momentum", step_nm, state_nm, images, segs)
    state2 = fresh(optax.sgd(1e-3, momentum=0.9))
    step_xla = make_train_step(loss_fn=xla_loss, accumulate=1)
    timeit("full step, XLA (unfused) loss", step_xla, state2, images, segs)


if __name__ == "__main__":
    main()
