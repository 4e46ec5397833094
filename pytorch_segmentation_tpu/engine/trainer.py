"""Trainer — the training engine (TPU-native rebuild of the
pytorch_modules.utils.Trainer contract, SURVEY.md §2.9).

Contract preserved from the reference usage (train.py:61-81):
  Trainer(model, fetcher, loss_fn, workdir, accumulate, adam, lr, weights,
          resume, mixed_precision) with attrs .epoch, .model, .metrics and
  methods .step() (one epoch) and .save(best).

TPU-native internals: one jitted train step (cross-batch grad accumulation
in a persistent f32 accumulator with a branchless every-k optimizer update,
bf16 compute / f32 params+optimizer when mixed_precision), parameters
replicated and batches sharded over the data mesh axis; XLA emits the
gradient all-reduce over ICI. No DDP wrapper, no loss scaling (bf16 needs
none — replaces apex AMP, reference train.py:102-105).
"""

from __future__ import annotations

import os.path as osp
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from tqdm import tqdm

from ..ops.loss import compute_loss, make_loss_fn
from ..parallel.mesh import (data_sharding, make_mesh, put_global_batch,
                             put_replicated_tree, replicated_sharding)
from .checkpoint import load_checkpoint, restore_into, save_checkpoint
from .steps import create_train_state, make_train_step

__all__ = ["Trainer", "ModelBundle", "make_lr_schedule"]


def make_lr_schedule(name: str, lr: float, warmup_steps: int = 0,
                     total_steps: int | None = None):
    """LR schedule over OPTIMIZER-UPDATE counts (= loader batches /
    accumulate). 'constant' matches the reference CLI contract; 'cosine'
    (warmup+cosine) and 'poly' (the (1-s/T)^0.9 DeepLab schedule,
    arXiv:1706.05587 §4.1) are the production options. Returns an optax
    schedule (or the float lr for constant-without-warmup)."""
    if name == "cosine":
        decay_steps = max((total_steps or 10000) - warmup_steps, 1)
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, max(warmup_steps, 1), warmup_steps + decay_steps,
            end_value=lr * 0.01)
    if name == "poly":
        decay_steps = max((total_steps or 10000) - warmup_steps, 1)
        # no transition_begin: join_schedules already rebases the step
        # count to the boundary for the second schedule
        poly = optax.polynomial_schedule(lr, 0.0, 0.9, decay_steps)
        if warmup_steps:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup_steps), poly],
                [warmup_steps])
        return poly
    if name != "constant":
        raise ValueError(f"unknown lr schedule {name!r}")
    if warmup_steps:
        return optax.linear_schedule(0.0, lr, warmup_steps)
    return lr


class ModelBundle:
    """A model definition + its live variables, passed around where the
    reference passes an nn.Module instance (e.g. test(trainer.model, ...))."""

    def __init__(self, module, params, batch_stats):
        self.module = module
        self.params = params
        self.batch_stats = batch_stats

    @property
    def apply_fn(self):
        return self.module.apply


class Trainer:
    def __init__(self, model, fetcher, loss_fn=compute_loss,
                 workdir: str = "weights", accumulate: int = 1,
                 adam: bool = False, lr: float = 1e-3, weights: str = "",
                 resume: bool = False, mixed_precision: bool = False,
                 momentum: float = 0.9, weight_decay: float = 0.0,
                 clip_grad: float = 0.0,
                 mesh=None, seed: int = 0, log: bool = True,
                 log_dir: str = "runs", profile: bool = False,
                 defer_upsample: bool = True, lr_schedule: str = "constant",
                 warmup_steps: int = 0, total_steps: int | None = None,
                 qat: bool = False, ema_decay: float = 0.0,
                 aux_weight: float = 0.4, distill_fn=None,
                 distill_weight: float = 0.0, distill_temp: float = 2.0,
                 zero: bool = False):
        self.module = model
        self.fetcher = fetcher
        self.workdir = workdir
        self.accumulate = max(1, int(accumulate))
        self.epoch = 0
        self.metrics = 0.0  # best val mIoU so far (reference train.py:76-79)
        self.log = log
        self.log_dir = log_dir
        self.profile = profile  # jax.profiler trace of first-epoch steps
        self._lr = lr

        # LR schedule (the reference Trainer's schedule lives in the
        # unavailable pytorch_modules package; constant matches its CLI
        # contract, warmup+cosine / poly offered as production options)
        # total_steps counts OPTIMIZER UPDATES (= loader batches / accumulate
        # with the reference's every-k-batches accumulation semantics)
        schedule = make_lr_schedule(lr_schedule, lr, warmup_steps,
                                    total_steps)
        # schedule-aware lr reporting for log.jsonl (observability)
        self._lr_at = schedule if callable(schedule) else (lambda s: lr)
        if adam:
            tx = optax.adam(schedule)
        else:
            tx = optax.sgd(schedule, momentum=momentum, nesterov=False)
        if weight_decay:
            # decay ADDED TO the gradients before the optimizer = torch
            # SGD/Adam weight_decay (coupled L2, momentum sees the decay) —
            # NOT decoupled AdamW
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
        if clip_grad:
            # clip the RAW gradients' global norm before decay/optimizer
            # (torch.nn.utils.clip_grad_norm_ ordering)
            tx = optax.chain(optax.clip_by_global_norm(clip_grad), tx)
        self.tx = tx

        self.mesh = mesh if mesh is not None else make_mesh()
        self._data_sharding = data_sharding(self.mesh)
        self._repl_sharding = replicated_sharding(self.mesh)
        # hand the batch sharding to the fetcher's PostFetch so it places
        # (single-host) or globally assembles (multi-host, BEFORE the device
        # augment program — no per-batch D2H bounce) its outputs; step()'s
        # put_global_batch then passes them through untouched
        pf = getattr(fetcher, "post_fetch_fn", None)
        if pf is not None and getattr(pf, "sharding", False) is None:
            pf.sharding = self._data_sharding

        # TPU-first: train on low-res logits and fold the model's trailing
        # bilinear upsample into the loss (fused Pallas upsample+CE on TPU).
        # Mathematically identical — the upsample is linear and trailing —
        # but full-res logits/grads never hit HBM. Disabled automatically
        # for custom loss functions (unknown upsample semantics).
        self._train_module = self.module
        align = getattr(self.module, "up_align_corners", True)
        if (defer_upsample and loss_fn is compute_loss
                and getattr(self.module, "full_res_output", None) is True):
            self._train_module = self.module.clone(full_res_output=False)
            loss_fn = make_loss_fn(align_corners=align)

        # init from the dataset's static shape (params are identical for
        # the deferred-upsample clone: the upsample has no parameters)
        ds = fetcher.loader.dataset
        w, h = ds.img_size
        sample = jnp.zeros((1, h, w, 3), jnp.float32)
        rng = jax.random.PRNGKey(seed)
        self.ema_decay = float(ema_decay)
        self.state = create_train_state(self._train_module, rng, sample,
                                        self.tx, accumulate=self.accumulate,
                                        ema=self.ema_decay > 0)

        if weights:
            # warm start tolerates modules the checkpoint lacks (they train
            # from scratch): e.g. --aux-loss on a ckpt trained without it,
            # or a ported backbone-only checkpoint
            ckpt = load_checkpoint(weights)
            self.state = self.state.replace(
                params=restore_into(self.state.params, ckpt["model"],
                                    allow_missing=True),
                batch_stats=restore_into(self.state.batch_stats,
                                         ckpt["batch_stats"],
                                         allow_missing=True))
        if resume:
            last = osp.join(workdir, "last.ckpt")
            ckpt = load_checkpoint(last)
            self.state = self.state.replace(
                params=restore_into(self.state.params, ckpt["model"]),
                batch_stats=restore_into(self.state.batch_stats,
                                         ckpt["batch_stats"]),
                opt_state=restore_into(self.state.opt_state,
                                       ckpt["opt_state"]))
            self.epoch = int(ckpt["epoch"])
            self.metrics = float(ckpt["best_miou"])
            if self.ema_decay > 0 and ckpt.get("ema") is not None:
                self.state = self.state.replace(
                    ema_params=restore_into(self.state.ema_params,
                                            ckpt["ema"]))
        if self.ema_decay > 0 and weights and not resume:
            # warm start: re-seed the average at the loaded params (real
            # copy — aliasing would double-donate buffers in the train step)
            self.state = self.state.replace(ema_params=jax.tree.map(
                lambda p: jnp.array(p, dtype=jnp.float32, copy=True),
                self.state.params))

        # place over the mesh after any restore (multi-host: every process
        # inits/loads the same state and contributes its replicas). On a
        # tensor-parallel mesh (a 'model' axis — train.py --tp) the matched
        # transformer weights shard over it (parallel/tp.py); otherwise
        # everything replicates — the reference's DDP placement — unless
        # --zero shards the optimizer state over 'data' (parallel/zero.py).
        self._zero_shardings = None
        axes = getattr(self.mesh, "axis_names", ())
        if zero and ("model" in axes or "pipe" in axes or "expert" in axes):
            raise ValueError("--zero composes with data parallelism only; "
                             "the tp/pp/ep paths already shard their "
                             "optimizer state with the weights "
                             "(parallel/zero.py)")
        if zero and dict(self.mesh.shape).get("data", 1) > 1:
            from ..parallel.zero import shard_zero, zero_state_shardings
            self._zero_shardings = zero_state_shardings(self.state,
                                                        self.mesh)
            self.state = shard_zero(self.state, self.mesh)
        elif "model" in getattr(self.mesh, "axis_names", ()):
            from ..parallel.mesh import put_tree
            from ..parallel.tp import tp_state_shardings
            self.state = put_tree(
                tp_state_shardings(self.state, self.mesh), self.state)
        elif "pipe" in getattr(self.mesh, "axis_names", ()):
            # pipeline-parallel mesh (train.py --pp): stacked block params
            # shard layer-wise over 'pipe' (parallel/pp.py)
            from ..parallel.mesh import put_tree
            from ..parallel.pp import pp_state_shardings
            self.state = put_tree(
                pp_state_shardings(self.state, self.mesh), self.state)
        elif "expert" in getattr(self.mesh, "axis_names", ()):
            # expert-parallel mesh (train.py --ep): MoE expert stacks
            # shard over 'expert' (parallel/ep.py)
            from ..parallel.ep import ep_state_shardings
            from ..parallel.mesh import put_tree
            self.state = put_tree(
                ep_state_shardings(self.state, self.mesh), self.state)
        else:
            self.state = put_replicated_tree(self._repl_sharding, self.state)

        self.qat = bool(qat)  # quantization-aware training (train.py --qat)
        # ZeRO: pin the output layout so the optimizer state STAYS sharded
        # over 'data' across steps (otherwise GSPMD may pick its own)
        out_sh = (None if self._zero_shardings is None
                  else (self._zero_shardings, self._repl_sharding))
        self._train_step = make_train_step(loss_fn=loss_fn,
                                           accumulate=self.accumulate,
                                           qat=self.qat,
                                           ema_decay=self.ema_decay,
                                           aux_weight=aux_weight,
                                           distill_fn=distill_fn,
                                           distill_weight=distill_weight,
                                           distill_temp=distill_temp,
                                           out_shardings=out_sh)

    @property
    def model(self) -> ModelBundle:
        return ModelBundle(self.module, self.state.params,
                           self.state.batch_stats)

    @property
    def ema_model(self) -> ModelBundle:
        """ModelBundle over the EMA-averaged params (--ema); falls back to
        the raw params when EMA is off. batch_stats are shared — BN running
        stats are already a moving average of the data statistics."""
        params = self.state.ema_params
        if params is None:
            params = self.state.params
        return ModelBundle(self.module, params, self.state.batch_stats)

    def warmup(self, sizes_hw, batch_size: int, label_hw=None):
        """Precompile the train step for every input size in `sizes_hw`
        (the bounded multi-scale set, data/resize_host.py) so the first
        epoch has no mid-epoch compile stalls. Labels stay at the dataset's
        base resolution (reference utils/datasets.py:206-212 resizes images
        only). Runs each size once on zeros and discards the result — the
        jit cache keeps the executable."""
        if label_hw is None:
            ds = self.fetcher.loader.dataset
            w, h = ds.img_size
            label_hw = (h, w)
        # the step donates its state arg: allocate ONE throwaway zeros state
        # and thread it through — each call's returned state feeds the next
        # size, so warmup never copies the live weights
        s = jax.tree.map(jnp.zeros_like, self.state)
        for hh, ww in sizes_hw:
            images, segs = put_global_batch(
                self._data_sharding,
                np.zeros((batch_size, hh, ww, 3), np.float32),
                np.zeros((batch_size,) + tuple(label_hw), np.int32))
            s, loss = self._train_step(s, images, segs)
            float(loss)  # force compile+run before the next size
            if self.log and jax.process_index() == 0:
                print(f"warmup: compiled train step @ {hh}x{ww}")

    def step(self):
        """Run one training epoch (reference Trainer.step contract)."""
        running_loss = 0.0
        n = 0
        t0 = time.time()
        images_seen = 0
        profiling = False
        pending_loss = None
        pbar = tqdm(self.fetcher, total=len(self.fetcher),
                    disable=not self.log or jax.process_index() != 0)
        for images, segs, valid in pbar:
            if self.profile and self.epoch == 0 and n == 2:
                jax.profiler.start_trace(osp.join(self.log_dir, "profile"))
                profiling = True
            # single-host: device_put; multi-host: the loader yields this
            # process's rank shard and the shards assemble into one global
            # array (jax.make_array_from_process_local_data)
            images, segs = put_global_batch(self._data_sharding, images, segs)
            self.state, loss = self._train_step(self.state, images, segs)
            n += 1
            images_seen += int(valid)
            # read the PREVIOUS step's loss: the host sync (a ~33 ms tunnel
            # round-trip that waits for step completion) overlaps the
            # current step's device compute instead of serializing after it
            if pending_loss is not None:
                running_loss += float(pending_loss)
            pending_loss = loss
            if profiling and n == 7:
                jax.profiler.stop_trace()
                profiling = False
            if n > 1:
                pbar.set_description(
                    f"epoch {self.epoch} loss {running_loss / (n - 1):8g}")
        if pending_loss is not None:
            running_loss += float(pending_loss)
        if profiling:
            jax.profiler.stop_trace()
        self.epoch += 1
        dt = time.time() - t0
        mean_loss = running_loss / max(n, 1)
        if self.log and n and jax.process_index() == 0:
            print(f"epoch {self.epoch - 1}: {images_seen / dt:.1f} img/s, "
                  f"loss {mean_loss:.4f}")
        self.log_record(epoch=self.epoch - 1, loss=mean_loss,
                        images_per_sec=images_seen / max(dt, 1e-9),
                        seconds=dt,
                        # actual scheduled lr at the current update count
                        # (state.step), not the constant ctor value
                        lr=float(self._lr_at(int(self.state.step))),
                        steps=n)
        return mean_loss

    def log_record(self, **record):
        """Append a JSONL record to <log_dir>/log.jsonl (the structured-log
        equivalent of the reference Trainer's TensorBoard runs/ dir —
        SURVEY.md §5 observability)."""
        if jax.process_index() != 0:
            return
        import json
        import os
        os.makedirs(self.log_dir, exist_ok=True)
        record.setdefault("time", time.time())
        with open(osp.join(self.log_dir, "log.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")

    def save(self, best: bool = False):
        """Write last.ckpt (and best.ckpt when best) — reference
        Trainer.save(best) contract; rank-0 only."""
        if jax.process_index() != 0:
            return
        kw = dict(params=self.state.params, batch_stats=self.state.batch_stats,
                  opt_state=self.state.opt_state, epoch=self.epoch,
                  best_miou=self.metrics, ema=self.state.ema_params)
        save_checkpoint(osp.join(self.workdir, "last.ckpt"), **kw)
        if best:
            save_checkpoint(osp.join(self.workdir, "best.ckpt"), **kw)
