#!/usr/bin/env python3
"""Wall-clock eval throughput through engine.evaluate.test (the production
loop incl. host reads, tqdm, put_global_batch) on synthetic in-memory
batches — measures the pipelined-host-read loop, not just the device step.
"""

import time
import types

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_segmentation_tpu.engine.evaluate import test as run_eval
from pytorch_segmentation_tpu.engine.trainer import ModelBundle
from pytorch_segmentation_tpu.models import DeepLabV3Plus
from pytorch_segmentation_tpu.utils.runtime import setup_runtime

B, H, W, NC, NBATCH = 32, 513, 513, 21, 12


class FakeDataset:
    classes = [f"c{i}" for i in range(NC)]


class FakeLoader:
    dataset = FakeDataset()

    def __len__(self):
        return NBATCH


class FakeFetcher:
    """Yields preloaded numpy batches (images, segs, valid)."""

    loader = FakeLoader()

    def __init__(self):
        rng = np.random.default_rng(0)
        # pre-staged ON DEVICE: the dev tunnel's host->device path is only
        # ~35 MB/s (a 101 MB f32 batch costs ~4 s), which would measure the
        # tunnel, not the eval loop; real TPU-VM hosts feed over PCIe
        self.images = jnp.asarray(
            rng.standard_normal((B, H, W, 3)).astype(np.float32))
        self.segs = jnp.asarray(
            rng.integers(0, NC, (B, H, W)).astype(np.int32))

    def __len__(self):
        return NBATCH

    def __iter__(self):
        for _ in range(NBATCH):
            yield self.images, self.segs, B


def main():
    setup_runtime()
    model = DeepLabV3Plus(num_classes=NC, dtype=jnp.bfloat16,
                          full_res_output=False)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    bundle = ModelBundle(model, variables["params"],
                         variables.get("batch_stats", {}))
    f = FakeFetcher()
    run_eval(bundle, f, show_first_batch=False, log=False)  # warm/compile
    t0 = time.perf_counter()
    run_eval(bundle, f, show_first_batch=False, log=False)
    dt = time.perf_counter() - t0
    print(f"eval e2e: {B * NBATCH / dt:7.1f} img/s "
          f"({dt / NBATCH * 1e3:.1f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
