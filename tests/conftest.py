"""Test config: force the JAX CPU backend with 8 virtual devices so mesh /
sharding / collective behaviour is exercised without TPU hardware
(SURVEY.md §4 test strategy).

Note: this environment's sitecustomize force-registers a TPU ('axon')
backend and overrides the JAX_PLATFORMS env var, so the env-var approach is
not enough — the config must be updated in-process before first backend use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # The 8 virtual device threads share ONE core here; late in a long
    # suite run (hundreds of live executables) a device thread can miss
    # XLA:CPU's default 30 s collective-rendezvous deadline and the runtime
    # SIGABRTs the whole process ("Fatal Python error: Aborted" from inside
    # a train step; reproduced at tests/test_train_e2e.py in full-suite
    # runs while the same tests pass in smaller groups). Raise the hard
    # deadline so overload degrades to slowness instead of death.
    flags = (flags + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
             " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax reads XLA_FLAGS instead

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (2-process distributed runs)")


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture(scope="session")
def synthetic_coco(tmp_path_factory):
    """Tiny on-disk COCO-format dataset: 2 foreground classes, 96x96 images
    (BASELINE.json config 1, CPU-runnable)."""
    from pytorch_segmentation_tpu.utils.synthetic import make_synthetic_coco
    root = tmp_path_factory.mktemp("synthetic_coco")
    make_synthetic_coco(str(root), num_train=16, num_val=8, img_size=96,
                        seed=0)
    return str(root)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
