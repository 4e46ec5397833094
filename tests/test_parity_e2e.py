"""Gating test for the outcome-level accuracy-parity harness
(tools/parity_e2e.py — round-3 review #1): a short-horizon side-by-side
training of the torch-reconstructed reference and this framework from
identical ported weights on identical batches.

The committed full-horizon evidence lives in PARITY_E2E.md (400-step
constant-lr: every family inside the torch-vs-torch batch-order noise
band; 800-step poly-decayed: plateau deltas within the pre-registered
tolerance). This test pins the harness itself: the ported start must be
numerically exact (step-1 loss), and a 60-step run must stay within the
loose short-horizon band (trajectories diverge chaotically in f32 — the
tight step-for-step bounds live in test_train_parity.py)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_short_horizon_outcome_parity():
    from parity_e2e import run_parity

    rec = run_parity("unet", steps=60, hw=64, bs=4, train_n=48, val_n=32,
                     eval_every=20, schedule="poly", log=lambda *a: None)
    # identical ported start: first losses match to float noise
    assert rec["loss_step1_delta"] < 1e-4, rec["loss_step1_delta"]
    # both frameworks actually learned the task
    assert rec["torch_miou"] > 0.35 and rec["jax_miou"] > 0.35, rec
    # short-horizon band (chaotic-divergence regime; the converged-run
    # gate in tools/parity_e2e.py uses 0.005 + noise-floor bracketing)
    assert rec["delta_plateau"] < 0.08, rec["delta_plateau"]
