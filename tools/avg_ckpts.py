"""Average N checkpoints into one (SWA-style weight averaging).

Usage:
    python tools/avg_ckpts.py out.ckpt ckpt1 ckpt2 [...] [--ema]

Averages the `model` params (and, with --ema, the stored EMA trees)
of the input checkpoints uniformly — stochastic weight averaging
(Izmailov et al. 2018) over the saved trajectory, the offline
complement of train.py --ema's online average. batch_stats are taken
from the LAST checkpoint: BN running statistics are not parameters and
averaging them across snapshots is neither SWA's prescription (it
recomputes them on data) nor a better estimate than the freshest ones;
for exact SWA-BN, run one extra eval/epoch to refresh stats (a forward
pass in train mode updates them).

The output is a standard framework checkpoint loadable by every CLI
(`--weights`), with opt_state dropped (an averaged optimizer state is
meaningless) and epoch/best_miou carried from the last input.
"""

from __future__ import annotations

import argparse

import numpy as np


def average_checkpoints(paths, use_ema: bool = False) -> dict:
    import jax

    from pytorch_segmentation_tpu.engine.checkpoint import load_checkpoint

    ckpts = [load_checkpoint(p) for p in paths]
    key = "ema" if use_ema else "model"
    trees = []
    for p, c in zip(paths, ckpts):
        t = c.get(key)
        if t is None:
            raise SystemExit(f"{p} has no {key!r} tree "
                             f"(--ema needs checkpoints from train.py --ema)")
        trees.append(t)
    ref = jax.tree.structure(trees[0])
    for p, t in zip(paths[1:], trees[1:]):
        if jax.tree.structure(t) != ref:
            raise SystemExit(f"{p} has a different parameter structure "
                             f"than {paths[0]} (same model/variant needed)")
    n = float(len(trees))
    mean = jax.tree.map(
        lambda *ls: (np.sum([np.asarray(l, np.float64) for l in ls],
                            axis=0) / n).astype(np.asarray(ls[0]).dtype),
        *trees)
    out = dict(ckpts[-1])
    out["model"] = mean
    out["opt_state"] = None
    if use_ema:
        out["ema"] = None  # the average IS the model tree now
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("out", help="output checkpoint path")
    ap.add_argument("ckpts", nargs="+", help="input checkpoints (>= 2)")
    ap.add_argument("--ema", action="store_true",
                    help="average the stored EMA trees instead of the raw "
                         "params")
    opt = ap.parse_args()
    if len(opt.ckpts) < 2:
        raise SystemExit("need at least 2 checkpoints to average")
    from flax import serialization
    payload = average_checkpoints(opt.ckpts, use_ema=opt.ema)
    with open(opt.out, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    print(f"wrote {opt.out}: uniform average of {len(opt.ckpts)} "
          f"checkpoints ({'ema' if opt.ema else 'model'} trees)")


if __name__ == "__main__":
    main()
