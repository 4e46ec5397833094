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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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
