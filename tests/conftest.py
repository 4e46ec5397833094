"""Test config: force the JAX CPU backend with 8 virtual devices so mesh /
sharding / collective behaviour is exercised without TPU hardware
(SURVEY.md §4 test strategy)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


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
