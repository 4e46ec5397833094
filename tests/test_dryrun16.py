"""n_devices beyond 8 (round-3 review #6): the full multi-chip dry run —
DP x spatial, TP, PP, EP, ZeRO, MoE+ZeRO, TP x PP x DP, Segmenter-TP —
on a 16-virtual-device CPU mesh.

Runs in a SUBPROCESS because the device count is a process-global
(jax_num_cpu_devices=8 is pinned by conftest for every other test).
Gated by PSEG_SLOW_TESTS on this 1-core box: 16 XLA:CPU device threads
time-share one core and the compile alone is ~20+ min (the 8-device
variant is exercised every round by the driver; a 16-device pass is
recorded in PROGRESS for each round it was run). Set PSEG_SLOW_TESTS=1
to run it here; it runs unconditionally on multi-core hosts.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


@pytest.mark.skipif(
    os.cpu_count() <= 2 and not os.environ.get("PSEG_SLOW_TESTS"),
    reason="16 virtual devices on a 1-2 core host: set PSEG_SLOW_TESTS=1")
def test_dryrun_multichip_16():
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(16); "
         "print('OK16')"],
        cwd=ROOT, capture_output=True, text=True, timeout=5400)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK16" in r.stdout, r.stdout[-500:]
