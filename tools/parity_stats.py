"""Statistical analysis of the HRNet outcome-parity offset (VERDICT r4
#1): is the cross-framework plateau delta systematic, or batch-order
noise?

Inputs: artifacts_parity_hrnet_r5_s*.json produced by
    python tools/parity_e2e.py --models hrnet --schedule poly --steps 800 \
        --noise-floor --floor-runs 3 --seed S --json ...

Per seed S the harness records:
  cross_delta_signed   = jax_plateau - torch_plateau  (same batch order)
  floor_deltas_signed  = [torch_rerun_k - torch_paired for k in 1..3]
                         (same init, three DIFFERENT batch orders)

Test: the null hypothesis is that the cross-framework delta is a draw
from the torch-vs-torch batch-order-noise distribution (symmetric,
centered at 0 — reruns differ from the paired run only by batch order,
exactly the perturbation class that separates the two frameworks after
their numerics diverge). We compare the MEAN cross delta against the
null via a permutation-style Monte Carlo: resample n_seed values from
the pooled, sign-symmetrized floor deltas and ask how often |mean|
exceeds the observed |mean cross|.  (Sign-symmetrization enforces the
null's zero center; the floor deltas' own mean is itself noise at this
sample size.)  Also reports a paired t-test on the cross deltas and the
per-seed table.
"""

import glob
import json
import sys

import numpy as np


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 else \
        "artifacts_parity_hrnet_r5_s*.json"
    cross, floors, rows = [], [], []
    for f in sorted(glob.glob(pat)):
        r = json.load(open(f))[0]
        cross.append(r["cross_delta_signed"])
        floors.extend(r["floor_deltas_signed"])
        rows.append((r["seed"] if "seed" in r else f,
                     r["torch_plateau"], r["jax_plateau"],
                     r["cross_delta_signed"], r["floor_deltas_signed"]))
    cross = np.asarray(cross)
    floors = np.asarray(floors)
    n = len(cross)
    print(f"{n} seeds, {len(floors)} torch-vs-torch floor deltas\n")
    print("| seed/file | torch plateau | jax plateau | cross Δ (jax-torch)"
          " | floor Δs |")
    print("|---|---|---|---|---|")
    for s, tp, jp, c, fl in rows:
        print(f"| {s} | {tp:.4f} | {jp:.4f} | {c:+.4f} | "
              f"{', '.join(f'{x:+.4f}' for x in fl)} |")

    mc = float(np.mean(cross))
    print(f"\nmean cross delta: {mc:+.4f}  (sd {np.std(cross):.4f}, "
          f"range [{cross.min():+.4f}, {cross.max():+.4f}])")
    print(f"floor deltas: mean {np.mean(floors):+.4f}, "
          f"sd {np.std(floors):.4f}, "
          f"range [{floors.min():+.4f}, {floors.max():+.4f}]")

    # Monte Carlo under the symmetrized null
    rng = np.random.default_rng(0)
    pool = np.concatenate([floors, -floors])
    sims = rng.choice(pool, size=(200000, n), replace=True).mean(1)
    p_mc = float(np.mean(np.abs(sims) >= abs(mc)))
    print(f"\nMonte-Carlo p (|mean of {n} null draws| >= |{mc:+.4f}|): "
          f"{p_mc:.4f}")

    # one-sample t on the cross deltas (H0: mean 0)
    se = np.std(cross, ddof=1) / np.sqrt(n)
    t = mc / max(se, 1e-12)
    from scipy import stats
    p_t = float(2 * stats.t.sf(abs(t), df=n - 1))
    print(f"one-sample t on cross deltas: t={t:.2f}, p={p_t:.4f}")

    verdict = "SYSTEMATIC" if (p_mc < 0.05 and p_t < 0.05) else \
        "consistent with batch-order noise"
    print(f"\nverdict at alpha=0.05: {verdict}")


if __name__ == "__main__":
    main()
