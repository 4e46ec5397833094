"""True multi-HOST data parallelism: a 2-process jax.distributed CPU job
(2 devices per process) must produce the same training loss, parameters, and
eval mIoU as a single process over the same global data — proving the
per-process loader shards + jax.make_array_from_process_local_data feed +
XLA gradient all-reduce compose correctly (reference 2-GPU DDP,
train.py:112-123 / README.md:44)."""

import json
import os
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "mh_worker.py")


def _run_single(tmp_path):
    out = tmp_path / "single.json"
    env = dict(os.environ)
    subprocess.run([sys.executable, _WORKER, "single", str(out)],
                   check=True, timeout=900, env=env)
    return json.loads(out.read_text())


def _run_two_process(tmp_path):
    out = tmp_path / "mh.json"
    env = dict(os.environ)
    env["MH_COORD"] = "localhost:12421"
    procs = [subprocess.Popen([sys.executable, _WORKER, str(r), str(out)],
                              env=env) for r in (0, 1)]
    for p in procs:
        assert p.wait(timeout=900) == 0
    return json.loads(out.read_text())


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    single = _run_single(tmp_path)
    multi = _run_two_process(tmp_path)
    # same global data, order-invariant reductions: agreement to float
    # reassociation noise
    assert abs(single["train_loss"] - multi["train_loss"]) < 1e-4, (
        single, multi)
    assert abs(single["miou"] - multi["miou"]) < 1e-4, (single, multi)
    rel = abs(single["param_sum"] - multi["param_sum"]) / single["param_sum"]
    assert rel < 1e-4, (single, multi)
