"""Outcome-level accuracy parity: torch-reconstructed reference vs this
framework, trained side by side to convergence, compared on val mIoU.

This is the strongest accuracy-parity evidence achievable in this
environment (no VOC data / zoo weights / network — see
docs/MIOU_PARITY_RUNBOOK.md for the blocked real-data protocol): both
frameworks start from IDENTICAL weights (torch init ported through the
production converters), consume IDENTICAL normalized batches in IDENTICAL
order with augmentation off (the approximated-augmentation question is
measured separately by tools/parity_augment.py), run the same optimizer
(SGD+momentum, the reference Trainer default — reference train.py:95
`--lr 1e-3` default, SGD unless `--adam`), and train for hundreds of
steps — far past the horizon where f32 reduction-order noise makes
trajectories chaotically diverge. The claim under test is therefore
outcome-level: *the two frameworks converge to the same answer*, not
merely that they track step-for-step (tests/test_train_parity.py already
pins the first few steps to 5e-3).

Gate: the plateau val-mIoU difference |JAX - torch| (plateau = mean of
the last 3 periodic evals) must be <= max(tolerance, 2 x noise floor),
tolerance 0.005 (0.5 points on the 0-100 scale), noise floor = the
measured torch-vs-torch distance under a different batch order (same
init). Gate history, for honesty: the round-4 pre-registration AND-ed
the fixed 0.005 with the noise-floor bound; the first converged runs
showed the reference FAILS that against itself (torch-vs-torch plateau
distances 0.0087/0.0227 at 800 poly-decayed steps on this task), i.e. a
fixed sub-noise tolerance is impossible-in-principle, so the gate was
revised to the max() form — the cross-framework distance must be
indistinguishable from the reference's own batch-order variance unless
both are under 0.005. Recorded runs: PARITY_E2E.md.

Run (CPU-only by design; the torch side has no TPU):
    python tools/parity_e2e.py --models unet,deeplabv3plus,hrnet \
        --steps 400 --out PARITY_E2E.md

The pytest gate (tests/test_parity_e2e.py) runs a short-horizon version
of the same harness.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), "..")))
sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), "..",
                                        "tests")))

import jax

jax.config.update("jax_platforms", "cpu")

import cv2
import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn.functional as F

from pytorch_segmentation_tpu.engine.steps import TrainState, make_train_step
from pytorch_segmentation_tpu.models import DeepLabV3Plus, HRNet, UNet
from pytorch_segmentation_tpu.ops.loss import compute_loss
from pytorch_segmentation_tpu.utils.port_torch import (convert_mobilenetv2,
                                                       convert_resnet)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

NC = 3  # background / box / tri — the synthetic task of utils/synthetic.py


def make_shapes_data(n: int, hw: int, rng: np.random.Generator):
    """In-memory version of utils/synthetic.make_synthetic_coco's task:
    colored rectangles (class 1) and triangles (class 2) over noisy
    backgrounds, returned as normalized f32 NHWC images + int32 labels so
    both frameworks consume byte-identical arrays."""
    xs = np.empty((n, hw, hw, 3), np.float32)
    ys = np.empty((n, hw, hw), np.int32)
    for i in range(n):
        img = np.full((hw, hw, 3), rng.integers(40, 216, 3), np.uint8)
        img = (img + rng.normal(0, 8, img.shape)).clip(0, 255).astype(
            np.uint8)
        lbl = np.zeros((hw, hw), np.int32)
        for _ in range(int(rng.integers(1, 3))):
            cls = int(rng.integers(0, 2))
            cx = int(rng.integers(hw // 4, 3 * hw // 4))
            cy = int(rng.integers(hw // 4, 3 * hw // 4))
            r = int(rng.integers(hw // 8, hw // 4))
            if cls == 0:
                poly = [cx - r, cy - r, cx + r, cy - r, cx + r, cy + r,
                        cx - r, cy + r]
            else:
                poly = [cx, cy - r, cx + r, cy + r, cx - r, cy + r]
            pts = np.asarray([np.clip(v, 1, hw - 2) for v in poly],
                             np.int32).reshape(-1, 2)
            color = tuple(int(c) for c in rng.integers(0, 255, 3))
            cv2.fillPoly(img, [pts], color)
            mask = np.zeros((hw, hw), np.uint8)
            cv2.fillPoly(mask, [pts], 1)
            lbl[mask > 0] = cls + 1
        xs[i] = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) \
            / IMAGENET_STD
        ys[i] = lbl
    return xs, ys


def miou_from_preds(preds: np.ndarray, labels: np.ndarray,
                    nc: int = NC) -> float:
    """Shared numpy mIoU (reference test.py:55-72 zero-guard semantics —
    the frameworks' own metric kernels are separately unit-tested against
    this formula in tests/test_loss_metrics.py)."""
    conf = np.bincount((labels.reshape(-1) * nc + preds.reshape(-1)),
                       minlength=nc * nc).reshape(nc, nc)
    tp = np.diag(conf).astype(np.float64)
    union = conf.sum(0) + conf.sum(1) - tp
    iou = np.where(union > 0, tp / np.maximum(union, 1), 0.0)
    return float(iou.mean())


# name -> (flax ctor, torch-mirror ctor, backbone converter). FULL model
# configs — unlike the trajectory tests these are the production depths
# (reference models/{unet,deeplabv3plus,hrnet}.py).
def _cases():
    from torch_refs import TDeepLabV3Plus, THRNet, TMaskFormer, TUNet
    from pytorch_segmentation_tpu.models import MaskFormer
    return {
        "unet": (lambda: UNet(num_classes=NC, dtype=jnp.float32),
                 lambda: TUNet(NC), convert_mobilenetv2),
        "deeplabv3plus": (
            lambda: DeepLabV3Plus(num_classes=NC, dtype=jnp.float32),
            lambda: TDeepLabV3Plus(NC),
            lambda sd: convert_resnet(sd, layers=(3, 4, 6, 3))),
        "hrnet": (lambda: HRNet(num_classes=NC, dtype=jnp.float32),
                  lambda: THRNet(NC), None),
        "maskformer": (
            lambda: MaskFormer(num_classes=NC, dtype=jnp.float32),
            lambda: TMaskFormer(NC),
            lambda sd: convert_resnet(sd, layers=(3, 4, 6, 3))),
    }


# ---------------------------------------------------------------------------
# maskformer torch-side training (the set-prediction loss with EXACT
# Hungarian matching — the jax side trains with the production device
# Sinkhorn, so this side-by-side also bounds the matcher approximation's
# outcome cost; VERDICT r4 #4)
# ---------------------------------------------------------------------------

def _t_mf_layer(cls, mask, tgt, nc, w_cls=1.0, w_focal=20.0, w_dice=1.0,
                eos=0.1, alpha=0.25, gamma=2.0):
    """torch mirror of models/maskformer.py make_maskformer_loss.one_layer
    (same decomposed focal/dice costs and CE normalization), with scipy
    Hungarian on the detached cost."""
    from scipy.optimize import linear_sum_assignment
    b, nq, hh, ww = mask.shape
    onehot = F.one_hot(tgt.clamp(max=nc - 1), nc).float() \
        * (tgt < nc).float().unsqueeze(-1)                  # [B,h,w,C]
    valid = (tgt < nc).float()                              # [B,h,w]
    nvalid = valid.sum((1, 2)).clamp(min=1.0)               # [B]
    present = onehot.sum((1, 2)) > 0                        # [B, C]
    tsum = onehot.sum((1, 2))

    logp = F.log_softmax(cls, -1)
    m = torch.sigmoid(mask)
    fpos = -alpha * ((1 - m) ** gamma) * torch.log(m.clamp(min=1e-8))
    fneg = -(1 - alpha) * (m ** gamma) \
        * torch.log((1 - m).clamp(min=1e-8)) * valid[:, None]
    inter = torch.einsum("bqhw,bhwc->bqc", m * valid[:, None], onehot)
    pos = torch.einsum("bqhw,bhwc->bqc", fpos, onehot)
    neg = (fneg.sum((2, 3))[..., None]
           - torch.einsum("bqhw,bhwc->bqc", fneg, onehot))
    focal_qc = (pos + neg) / nvalid[:, None, None]
    dice_qc = 1.0 - (2 * inter + 1.0) / (
        (m * valid[:, None]).sum((2, 3))[..., None]
        + tsum[:, None, :] + 1.0)
    cost = (w_cls * (-logp[..., :nc].exp()) + w_focal * focal_qc
            + w_dice * dice_qc)

    asgn = torch.zeros(b, nc, nq)
    cnp = cost.detach().numpy()
    pnp = present.numpy()
    for i in range(b):
        cols = np.nonzero(pnp[i])[0]
        if len(cols) == 0:
            continue
        r, c = linear_sum_assignment(cnp[i][:, cols])
        asgn[i, cols[c], r] = 1.0

    n_match = asgn.sum().clamp(min=1.0)
    q_cls_logp = torch.einsum("bcq,bqc->bq", asgn, logp[..., :nc])
    matched = asgn.sum(1).clamp(max=1.0)
    ce = -(q_cls_logp + (1 - matched) * eos * logp[..., nc])
    denom = (matched.sum() + eos * (1 - matched).sum()).clamp(min=1.0)
    loss_cls = ce.sum() / denom
    focal_m = torch.einsum("bcq,bqc->bc", asgn, focal_qc)
    dice_m = torch.einsum("bcq,bqc->bc", asgn, dice_qc)
    loss_mask = (w_focal * focal_m.sum() + w_dice * dice_m.sum()) / n_match
    return w_cls * loss_cls + loss_mask


def _torch_step_maskformer(tmodel, x, y):
    cls, mask, aux, _ = tmodel(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        return_heads="all")
    ty = torch.from_numpy(y).long()
    hh, ww = mask.shape[-2:]
    sy, sx = y.shape[1] // hh, y.shape[2] // ww
    tgt = ty[:, ::sy, ::sx][:, :hh, :ww]
    total = _t_mf_layer(cls, mask, tgt, NC)
    for c, mk in aux:
        total = total + _t_mf_layer(c, mk, tgt, NC)
    return total


def _torch_step_ce(tmodel, x, y):
    out = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    return F.cross_entropy(out, torch.from_numpy(y).long())


def _case_losses(name):
    """(jax loss_fn for make_train_step, torch per-batch loss fn)."""
    if name == "maskformer":
        from pytorch_segmentation_tpu.models.maskformer import (
            make_maskformer_loss)
        return make_maskformer_loss(NC), _torch_step_maskformer
    return compute_loss, _torch_step_ce


def _poly_lr(lr, i, total):
    # the DeepLab poly schedule (arXiv:1706.05587 §4.1), decaying to 0 —
    # applied identically in both frameworks so the CONVERGED endpoint is
    # compared, not a point on the noisy constant-lr climb
    return lr * (1.0 - i / total) ** 0.9


def _train_torch(tmodel, batches, lr, momentum, eval_every, val, log,
                 schedule="constant", step_fn=_torch_step_ce,
                 opt="sgd"):
    # adam: the transformer families (maskformer) never leave the trivial
    # plateau under bare SGD at these horizons; torch.optim.Adam and
    # optax.adam implement the identical update (bias-corrected
    # m/(sqrt(v)+eps)), so the mirror stays exact
    topt = (torch.optim.Adam(tmodel.parameters(), lr=lr)
            if opt == "adam" else
            torch.optim.SGD(tmodel.parameters(), lr=lr, momentum=momentum))
    evals, losses = [], []
    tmodel.train()
    for i, (x, y) in enumerate(batches):
        if schedule == "poly":
            for g in topt.param_groups:
                g["lr"] = _poly_lr(lr, i, len(batches))
        topt.zero_grad()
        tl = step_fn(tmodel, x, y)
        tl.backward()
        topt.step()
        losses.append(float(tl.detach()))
        if (i + 1) % eval_every == 0 or i == len(batches) - 1:
            evals.append((i + 1, _eval_torch(tmodel, val)))
            tmodel.train()
            log(f"  torch step {i + 1}: loss {losses[-1]:.4f} "
                f"val mIoU {evals[-1][1]:.4f}")
    return evals, losses


def _eval_torch(tmodel, val, bs=8):
    xs, ys = val
    tmodel.eval()
    preds = []
    with torch.no_grad():
        for i in range(0, len(xs), bs):
            out = tmodel(torch.from_numpy(
                np.transpose(xs[i:i + bs], (0, 3, 1, 2))))
            preds.append(out.argmax(1).numpy())
    return miou_from_preds(np.concatenate(preds), ys)


def _train_jax(model, variables, batches, lr, momentum, eval_every, val,
               log, schedule="constant", loss_fn=compute_loss, opt="sgd"):
    if schedule == "poly":
        # optax polynomial_schedule(init, 0, 0.9, T) == _poly_lr at the
        # same update index (optax counts from 0, as does the torch loop)
        sched = optax.polynomial_schedule(lr, 0.0, 0.9, len(batches))
    else:
        sched = lr
    tx = optax.adam(sched) if opt == "adam" else \
        optax.sgd(sched, momentum=momentum)
    params = jax.tree.map(jnp.asarray, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=jax.tree.map(
                           jnp.asarray, variables["batch_stats"]),
                       opt_state=tx.init(params), tx=tx,
                       apply_fn=model.apply)
    step = make_train_step(loss_fn=loss_fn, accumulate=1,
                           donate=False)

    @jax.jit
    def predict(params, stats, x):
        logits = model.apply({"params": params, "batch_stats": stats}, x,
                             train=False)
        return jnp.argmax(logits, -1)

    def _eval(state):
        xs, ys = val
        preds = [np.asarray(predict(state.params, state.batch_stats,
                                    jnp.asarray(xs[i:i + 8])))
                 for i in range(0, len(xs), 8)]
        return miou_from_preds(np.concatenate(preds), ys)

    evals, losses = [], []
    for i, (x, y) in enumerate(batches):
        state, loss = step(state, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(loss))
        if (i + 1) % eval_every == 0 or i == len(batches) - 1:
            evals.append((i + 1, _eval(state)))
            log(f"  jax   step {i + 1}: loss {losses[-1]:.4f} "
                f"val mIoU {evals[-1][1]:.4f}")
    return evals, losses


def _plateau(evals, k=3):
    return float(np.mean([m for _, m in evals[-k:]]))


def run_parity(name: str, steps: int = 400, hw: int = 64, bs: int = 8,
               lr: float = 1e-2, momentum: float = 0.9,
               train_n: int = 256, val_n: int = 64, seed: int = 0,
               eval_every: int = 50, noise_floor: bool = False,
               schedule: str = "constant", floor_runs: int = 1,
               opt_name: str = "sgd", log=print) -> dict:
    """Train torch mirror + JAX framework from identical weights on
    identical batches; return the parity record."""
    from test_model_golden_parity import _port

    build, tbuild, conv = _cases()[name]
    rng = np.random.default_rng(seed)
    tr = make_shapes_data(train_n, hw, rng)
    val = make_shapes_data(val_n, hw, rng)

    # identical batch order for both frameworks: epoch-shuffled indices
    order_rng = np.random.default_rng(seed + 1)
    idx = []
    while len(idx) < steps * bs:
        idx.extend(order_rng.permutation(train_n))
    idx = np.asarray(idx[:steps * bs]).reshape(steps, bs)
    batches = [(tr[0][b], tr[1][b]) for b in idx]

    torch.manual_seed(seed)
    tmodel = tbuild()
    model = build()
    variables = _port(model, tmodel, conv, sample_hw=(hw, hw))

    jax_loss, torch_step = _case_losses(name)
    t0 = time.time()
    log(f"[{name}] torch training ({steps} steps)...")
    tevals, tlosses = _train_torch(tmodel, batches, lr, momentum,
                                   eval_every, val, log, schedule,
                                   step_fn=torch_step, opt=opt_name)
    t_torch = time.time() - t0

    t0 = time.time()
    log(f"[{name}] jax training ({steps} steps)...")
    jevals, jlosses = _train_jax(model, variables, batches, lr, momentum,
                                 eval_every, val, log, schedule,
                                 loss_fn=jax_loss, opt=opt_name)
    t_jax = time.time() - t0

    rec = {
        "model": name, "steps": steps, "hw": hw, "bs": bs, "lr": lr,
        "schedule": schedule, "seed": seed, "opt": opt_name,
        "torch_miou": tevals[-1][1], "jax_miou": jevals[-1][1],
        "torch_plateau": _plateau(tevals), "jax_plateau": _plateau(jevals),
        "delta_final": abs(tevals[-1][1] - jevals[-1][1]),
        "delta_plateau": abs(_plateau(tevals) - _plateau(jevals)),
        "loss_step1_delta": abs(tlosses[0] - jlosses[0]),
        "torch_evals": tevals, "jax_evals": jevals,
        "t_torch_s": round(t_torch, 1), "t_jax_s": round(t_jax, 1),
    }

    if noise_floor:
        # same init, different batch ORDER: the intrinsic outcome spread
        # of the torch reference against itself. floor_runs > 1 (round-5
        # statistics protocol, VERDICT r4 #1) samples the torch-vs-torch
        # delta DISTRIBUTION instead of a single floor estimate.
        floors = []
        for k in range(floor_runs):
            torch.manual_seed(seed)
            tmodel2 = tbuild()
            order2 = np.random.default_rng(seed + 999 + 1000 * k)
            idx2 = []
            while len(idx2) < steps * bs:
                idx2.extend(order2.permutation(train_n))
            idx2 = np.asarray(idx2[:steps * bs]).reshape(steps, bs)
            batches2 = [(tr[0][b], tr[1][b]) for b in idx2]
            log(f"[{name}] torch noise-floor run {k + 1}/{floor_runs}...")
            nevals, _ = _train_torch(tmodel2, batches2, lr, momentum,
                                     eval_every, val, log, schedule,
                                     step_fn=torch_step, opt=opt_name)
            floors.append(_plateau(nevals))
        rec["noise_floor_plateau_delta"] = abs(
            _plateau(tevals) - floors[0])
        rec["torch2_plateau"] = floors[0]
        rec["floor_plateaus"] = floors
        rec["floor_deltas_signed"] = [f - _plateau(tevals) for f in floors]
        rec["cross_delta_signed"] = _plateau(jevals) - _plateau(tevals)
    return rec


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--models", default="unet,deeplabv3plus,hrnet")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--train-n", type=int, default=256)
    ap.add_argument("--val-n", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--noise-floor", action="store_true")
    ap.add_argument("--floor-runs", type=int, default=1,
                    help="number of torch noise-floor reruns (distinct "
                         "batch orders; >1 samples the null distribution)")
    ap.add_argument("--schedule", default="constant",
                    choices=["constant", "poly"])
    ap.add_argument("--opt", default="sgd", choices=["sgd", "adam"])
    ap.add_argument("--noise-floor-models", default="",
                    help="comma list to restrict the extra torch run to")
    ap.add_argument("--tolerance", type=float, default=0.005,
                    help="pre-registered |plateau delta| gate")
    ap.add_argument("--out", default="",
                    help="markdown file to append the result table to")
    ap.add_argument("--json", default="", help="write records as JSON")
    opt = ap.parse_args()

    torch.set_num_threads(max(1, os.cpu_count()))
    recs = []
    nf_models = [m for m in opt.noise_floor_models.split(",") if m]
    for name in opt.models.split(","):
        name = name.strip()
        nf = opt.noise_floor and (not nf_models or name in nf_models)
        recs.append(run_parity(
            name, steps=opt.steps, hw=opt.hw, bs=opt.bs, lr=opt.lr,
            train_n=opt.train_n, val_n=opt.val_n, seed=opt.seed,
            eval_every=opt.eval_every, noise_floor=nf,
            schedule=opt.schedule, floor_runs=opt.floor_runs,
            opt_name=opt.opt))

    lines = ["| model | steps | torch mIoU (final/plateau) | "
             "jax mIoU (final/plateau) | Δplateau | noise floor | pass |",
             "|---|---|---|---|---|---|---|"]
    ok = True
    for r in recs:
        nf = r.get("noise_floor_plateau_delta")
        bound = max(opt.tolerance, 2 * nf) if nf is not None \
            else opt.tolerance
        gate = r["delta_plateau"] <= bound
        ok &= gate
        lines.append(
            f"| {r['model']} | {r['steps']} | "
            f"{r['torch_miou']:.4f}/{r['torch_plateau']:.4f} | "
            f"{r['jax_miou']:.4f}/{r['jax_plateau']:.4f} | "
            f"{r['delta_plateau']:.4f} | "
            f"{'%.4f' % nf if nf is not None else '—'} | "
            f"{'PASS' if gate else 'FAIL'} |")
    table = "\n".join(lines)
    print(table)
    if opt.out:
        with open(opt.out, "a") as f:
            f.write(f"\n## parity_e2e --steps {opt.steps} --hw {opt.hw} "
                    f"--bs {opt.bs} --lr {opt.lr} --seed {opt.seed} "
                    f"(tolerance {opt.tolerance})\n\n{table}\n")
    if opt.json:
        with open(opt.json, "w") as f:
            json.dump(recs, f, indent=1)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
