"""Checkpoint save / resume.

Mirrors the reference Trainer's checkpoint surface (SURVEY.md §5): a `weights/`
workdir containing `best.ckpt` and `last.ckpt`, each a msgpack blob holding
{params, batch_stats, opt_state, epoch, best_miou}. `--weights` warm-starts
params only; `--resume` restores the full training state (reference
train.py:97-98 semantics).
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "restore_into"]


def _to_host(tree):
    # to_state_dict converts namedtuple optimizer states / tuples into plain
    # nested dicts that msgpack can encode
    return jax.tree.map(lambda x: np.asarray(x),
                        serialization.to_state_dict(tree))


def save_checkpoint(path: str, params, batch_stats, opt_state=None,
                    epoch: int = 0, best_miou: float = 0.0, ema=None):
    payload = {
        "model": _to_host(params),  # key 'model' kept for reference parity
        "batch_stats": _to_host(batch_stats),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
        "epoch": int(epoch),
        "best_miou": float(best_miou),
        # EMA-averaged params (train.py --ema); None when EMA is off
        "ema": _to_host(ema) if ema is not None else None,
    }
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_into(template, restored, allow_missing: bool = False):
    """Restore a state-dict (nested dicts from load_checkpoint) into the
    structure of `template` (any pytree, incl. namedtuple optimizer states),
    with shape checks and dtype cast to the template's leaves.

    allow_missing=True fills modules the checkpoint lacks from the
    (already-initialized) template values, printing what stayed at init —
    the warm-start direction: e.g. `train.py --weights plain.ckpt
    --aux-loss 0.4` loads a non-aux checkpoint into a model whose aux head
    then trains from scratch. Without it, flax's from_state_dict raises on
    missing keys (extra checkpoint keys it silently ignores)."""
    if allow_missing and isinstance(restored, dict):
        filled: list = []

        def fill(tpl, res, prefix):
            if not isinstance(res, dict) or not isinstance(tpl, dict):
                return res
            out = dict(res)
            for k, v in tpl.items():
                name = f"{prefix}{k}"
                if k not in out:
                    filled.append(name)
                    out[k] = serialization.to_state_dict(v)
                else:
                    out[k] = fill(v, out[k], name + ".")
            return out

        restored = fill(serialization.to_state_dict(template), restored, "")
        if filled:
            print("checkpoint lacks these modules — kept at init "
                  f"(training them from scratch): {sorted(filled)}")
    out = serialization.from_state_dict(template, restored)

    def check(t, r):
        r = jnp.asarray(r)
        if hasattr(t, "shape") and tuple(t.shape) != tuple(r.shape):
            raise ValueError(
                f"checkpoint shape mismatch: {r.shape} vs {t.shape}")
        return r.astype(t.dtype) if hasattr(t, "dtype") else r

    return jax.tree.map(check, template, out)


def load_model_bundle(model, weights_path: str, sample_hw, num_channels=3,
                      use_ema: bool = False):
    """Build a ModelBundle for eval/inference from a checkpoint WITHOUT
    running real initialization: parameter shapes come from jax.eval_shape
    (free — no compute), values from the checkpoint. Falls back to real
    (jitted) init when weights_path is empty. use_ema=True loads the
    EMA-averaged params (checkpoints written by train.py --ema) instead of
    the raw trajectory; errors if the checkpoint has none."""
    import jax.numpy as jnp  # local to avoid cycles at module import

    from .trainer import ModelBundle

    h, w = sample_hw
    sample = jnp.zeros((1, h, w, num_channels), jnp.float32)
    if weights_path:
        shapes = jax.eval_shape(
            lambda rng, x: model.init({"params": rng}, x, train=False),
            jax.random.PRNGKey(0), sample)
        ckpt = load_checkpoint(weights_path)
        src = ckpt["model"]
        if use_ema:
            if ckpt.get("ema") is None:
                raise ValueError(f"{weights_path} holds no EMA params "
                                 "(trained without --ema)")
            src = ckpt["ema"]

        def drop_train_only(tree, template, what):
            # checkpoints from train.py --aux-loss carry the train-only
            # aux-head modules; an eval/serving model built without aux has
            # no slot for them. flax's from_state_dict already IGNORES
            # extra keys silently — this exists to tell the user which
            # modules were dropped (and to make the intent explicit)
            extra = [k for k in tree if k not in template]
            if extra:
                print(f"dropping train-only {what} modules not in the "
                      f"eval model: {sorted(extra)}")
                tree = {k: v for k, v in tree.items() if k in template}
            return tree

        src = drop_train_only(src, shapes["params"], "param")
        ckpt_stats = drop_train_only(ckpt["batch_stats"],
                                     shapes.get("batch_stats", {}), "stat")
        params = restore_into(shapes["params"], src)
        batch_stats = restore_into(shapes.get("batch_stats", {}),
                                   ckpt_stats)
    else:
        init_fn = jax.jit(lambda rng, x: model.init({"params": rng}, x,
                                                    train=False))
        variables = init_fn(jax.random.PRNGKey(0), sample)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
    return ModelBundle(model, params, batch_stats)
