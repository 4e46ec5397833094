#!/usr/bin/env python3
"""Two measurements for the round-3 feature additions:

1. EMA overhead on the bench train step (DLV3+ 513^2 bf16 bs32): interleaved
   A/B of make_train_step(ema_decay=0) vs (=0.999). EMA adds one FMA over
   every param leaf per optimizer update — expected noise-level next to the
   conv work; this records the number.
2. Tiled native-resolution serving (inference.make_tiled_mask_fn): DLV3+
   21-class, 2052^2 input, 513^2 tiles, 0.25 overlap -> ms/image. The
   useful comparison is against the reference CLI contract (downscale to
   513^2 + one forward) which this path replaces at 16x the pixel area.

Drift-proof protocol (CLAUDE.md): both variants in one process, alternating
rounds, medians. Usage: python tools/bench_ema_tiled.py [rounds]
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)
from pytorch_segmentation_tpu.engine.trainer import ModelBundle
from pytorch_segmentation_tpu.inference import make_mask_fn, make_tiled_mask_fn
from pytorch_segmentation_tpu.models import DeepLabV3Plus
from pytorch_segmentation_tpu.ops.loss import make_loss_fn
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

IMG, B = 513, 32


def bench_train_ema(rounds):
    model = DeepLabV3Plus(num_classes=21, dtype=jnp.bfloat16,
                          full_res_output=False)
    loss_fn = make_loss_fn(align_corners=True, out_hw=(IMG, IMG))

    def make(ema_decay):
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, IMG, IMG, 3), jnp.float32),
                                   optax.sgd(1e-3, momentum=0.9),
                                   ema=ema_decay > 0)
        step = make_train_step(loss_fn=loss_fn, accumulate=1,
                               ema_decay=ema_decay)
        return state, step

    images = jax.random.normal(jax.random.PRNGKey(1), (B, IMG, IMG, 3),
                               jnp.float32)
    segs = jax.random.randint(jax.random.PRNGKey(2), (B, IMG, IMG), 0, 21,
                              jnp.int32)

    def window(state, step, reps=6):
        # the step DONATES state — thread it through and return it
        state, loss = step(state, images, segs)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(reps):
            state, loss = step(state, images, segs)
        float(loss)  # host read = sync (block_until_ready unreliable here)
        return (time.perf_counter() - t0) / reps, state

    sa, stepa = make(0.0)
    sb, stepb = make(0.999)
    ab = {"raw": [], "ema": []}
    for r in range(rounds):
        dt, sa = window(sa, stepa)
        ab["raw"].append(dt)
        dt, sb = window(sb, stepb)
        ab["ema"].append(dt)
        print(f"round {r}: raw {B / ab['raw'][-1]:6.1f} img/s   "
              f"ema {B / ab['ema'][-1]:6.1f} img/s", flush=True)
    ma, mb = (statistics.median(ab[k]) for k in ("raw", "ema"))
    print(f"medians: raw {B / ma:.1f} img/s  ema {B / mb:.1f} img/s  "
          f"overhead {(mb / ma - 1) * 100:.2f}%")


def bench_tiled(rounds):
    model = DeepLabV3Plus(num_classes=21, dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, IMG, IMG, 3), jnp.float32),
                               optax.sgd(1e-3))
    bundle = ModelBundle(model, state.params, state.batch_stats)
    big = np.random.RandomState(0).randint(0, 255, (1, 2052, 2052, 3),
                                           np.uint8)
    small = np.random.RandomState(0).randint(0, 255, (1, IMG, IMG, 3),
                                             np.uint8)
    tiled = make_tiled_mask_fn(bundle, tile_hw=(IMG, IMG), overlap=0.25)
    plain = make_mask_fn(bundle, out_hw=(2052, 2052))

    def window(fn, x, reps=3):
        m = fn(x)
        int(m[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(reps):
            m = fn(x)
        int(m[0, 0, 0])
        return (time.perf_counter() - t0) / reps * 1e3

    ab = {"tiled2k": [], "ref513": []}
    for r in range(rounds):
        ab["tiled2k"].append(window(tiled, big))
        # the reference contract: downscale to 513 (host cost ignored),
        # forward once, upscale the mask — approximated by the plain
        # 513-forward + full-res argmax serving path
        ab["ref513"].append(window(plain, small))
        print(f"round {r}: tiled@2052 {ab['tiled2k'][-1]:7.1f} ms/img   "
              f"ref-513 {ab['ref513'][-1]:7.1f} ms/img", flush=True)
    mt, mr = (statistics.median(ab[k]) for k in ("tiled2k", "ref513"))
    n_tiles = 25  # 5x5 at 2052/513, overlap 0.25
    print(f"medians: tiled 2052^2 {mt:.1f} ms/img ({n_tiles} tiles, "
          f"{mt / n_tiles:.1f} ms/tile)  ref-513 {mr:.1f} ms/img  "
          f"native-res cost {mt / mr:.1f}x for 16x pixels")


if __name__ == "__main__":
    setup_runtime()
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    if which in ("both", "ema"):
        bench_train_ema(rounds)
    if which in ("both", "tiled"):
        bench_tiled(rounds)
