"""Sparse upcycling: initialize a MoE SegFormer from a dense checkpoint.

Usage:
    python tools/upcycle_moe.py dense.ckpt out.ckpt --num-classes N \
        [--variant b0] [--moe 8] [--moe-top-k 2]

The standard way to train MoE models without paying the from-scratch
price (Komatsuzaki et al. 2023, "Sparse Upcycling"): every expert of a
converted block starts as a copy of the dense block's FFN, the router
starts fresh, and everything else carries over 1:1. Training then
breaks the expert symmetry through the router's data-dependent
gradients (experts receive different token subsets from step one).

Mapping (models/segformer.py `--moe` placement — alternate stage-3/4
blocks, counted from each stage's last block):
  - converted blocks: `ffn.fc1/fc2` (dense MixFFN) -> `moe.experts.
    fc1/fc2` tiled E times on a new leading expert axis. The MixFFN's
    3x3 depthwise conv has no MoE counterpart (token dispatch destroys
    the spatial grid — nn/moe.py docstring) and is dropped; the
    surrounding dense blocks keep theirs.
  - `moe.router` keeps its fresh initialization (near-uniform routing
    at step 0 -> every expert sees ~the dense activations it was
    cloned from).
  - every other param/stat (attention, LNs, dense-stage FFNs, decoder)
    copies unchanged; opt_state is dropped (shapes changed).

The output is a standard checkpoint: continue with
    python train.py DATA --model segformer --moe E [--ep N] \
        --weights out.ckpt
"""

from __future__ import annotations

import argparse

import numpy as np


def upcycle(dense_ckpt: str, num_classes: int, variant: str = "",
            experts: int = 8, top_k: int = 2) -> dict:
    import jax
    import jax.numpy as jnp

    from pytorch_segmentation_tpu.engine.checkpoint import load_checkpoint
    from pytorch_segmentation_tpu.models import (apply_moe, build_model,
                                                 variant_kwargs)
    from pytorch_segmentation_tpu.utils.port_torch import jax_to_py

    payload = load_checkpoint(dense_ckpt)
    dense_params = payload["model"]

    model_kw = apply_moe("segformer",
                         variant_kwargs("segformer", variant),
                         experts, top_k)
    moe_model = build_model("segformer", num_classes=num_classes,
                            dtype=jnp.float32, **model_kw)
    variables = moe_model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               train=False)
    moe_params = jax_to_py(variables["params"])

    converted, copied = [], 0

    def walk(dst, src, path=""):
        nonlocal copied
        for key in dst:
            here = f"{path}/{key}" if path else key
            if key == "moe":
                ffn = src.get("ffn")
                if ffn is None:
                    raise SystemExit(
                        f"{path}: MoE block has no dense 'ffn' counterpart "
                        f"in {dense_ckpt} — wrong --variant, or the dense "
                        f"checkpoint was itself trained with --moe")
                for fc in ("fc1", "fc2"):
                    for leaf in ("kernel", "bias"):
                        w = np.asarray(ffn[fc][leaf])
                        dst["moe"]["experts"][fc][leaf] = np.broadcast_to(
                            w, (experts,) + w.shape).copy()
                # router keeps its fresh init
                converted.append(path)
            elif isinstance(dst[key], dict):
                if key not in src:
                    raise SystemExit(f"{here}: missing from the dense "
                                     f"checkpoint (wrong --variant?)")
                walk(dst[key], src[key], here)
            else:
                w = np.asarray(src[key])
                if w.shape != np.asarray(dst[key]).shape:
                    raise SystemExit(
                        f"{here}: shape {w.shape} != {dst[key].shape} "
                        f"(wrong --num-classes or --variant?)")
                dst[key] = w
                copied += 1

    walk(moe_params, dense_params)
    if not converted:
        raise SystemExit("no MoE blocks found — is --moe > 0?")
    print(f"upcycled {len(converted)} blocks to {experts} experts "
          f"({', '.join(converted)}); {copied} dense leaves carried over")

    out = dict(payload)
    out["model"] = moe_params
    out["batch_stats"] = payload["batch_stats"]  # tree unchanged by MoE
    out["opt_state"] = None
    out["ema"] = None
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("dense", help="dense segformer checkpoint")
    ap.add_argument("out", help="output MoE checkpoint path")
    ap.add_argument("-nc", "--num-classes", type=int, required=True)
    ap.add_argument("--variant", type=str, default="",
                    help="segformer size variant (must match the dense "
                         "checkpoint)")
    ap.add_argument("--moe", type=int, default=8, metavar="E")
    ap.add_argument("--moe-top-k", type=int, default=2, metavar="K")
    opt = ap.parse_args()

    from flax import serialization
    payload = upcycle(opt.dense, opt.num_classes, variant=opt.variant,
                      experts=opt.moe, top_k=opt.moe_top_k)
    with open(opt.out, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    print(f"wrote {opt.out} — continue with: train.py --model segformer "
          f"--moe {opt.moe} --weights {opt.out}")


if __name__ == "__main__":
    main()
