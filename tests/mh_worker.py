"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Runs one training epoch + one eval through the REAL Trainer / DataLoader /
evaluate.test stack, either single-process (mode 'single') or as one rank of
a 2-process jax.distributed CPU job (mode '0' / '1', coordinator address in
$MH_COORD). Writes {train_loss, miou, param_sum} as JSON to argv[2].

Multi-host contract exercised end-to-end: per-process DataLoader rank
shards (reference train.py:33-35 DistributedSampler), global batch assembly
via jax.make_array_from_process_local_data, replicated state, XLA-inserted
gradient all-reduce, interleaved eval padding masks, replicated metric
outputs (reference test.py:51-58 all_reduce).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

mode = sys.argv[1]
out_path = sys.argv[2]
if mode != "single":
    jax.distributed.initialize(os.environ["MH_COORD"], 2, int(mode))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pytorch_segmentation_tpu.data import DataLoader, Fetcher, PostFetch  # noqa: E402
from pytorch_segmentation_tpu.engine import Trainer, test  # noqa: E402
from pytorch_segmentation_tpu.models import UNet  # noqa: E402
from pytorch_segmentation_tpu.parallel import make_mesh  # noqa: E402


class SynthDS:
    classes = ["bg", "a", "b"]
    img_size = (32, 32)

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        r = np.random.default_rng(1000 + i)
        img = r.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        seg = r.integers(0, 3, (32, 32)).astype(np.uint8)
        return img, seg


def main():
    rank = jax.process_index()
    world = jax.process_count()
    mesh = make_mesh()

    train_loader = DataLoader(SynthDS(8), batch_size=8 // world,
                              shuffle=False, drop_last=True, num_workers=1,
                              rank=rank, world_size=world)
    trainer = Trainer(UNet(num_classes=3, dtype=jnp.float32),
                      Fetcher(train_loader, PostFetch()),
                      workdir="/tmp/mh_weights", accumulate=1, lr=0.01,
                      mesh=mesh, seed=0, log=False)
    train_loss = trainer.step()

    val_loader = DataLoader(SynthDS(6), batch_size=4 // world, shuffle=False,
                            num_workers=1, rank=rank, world_size=world)
    miou = test(trainer.model, Fetcher(val_loader, PostFetch()),
                show_first_batch=False, log=False, mesh=mesh)

    param_sum = float(sum(
        np.abs(np.asarray(p)).sum()
        for p in jax.tree.leaves(trainer.state.params)))
    if rank == 0:
        with open(out_path, "w") as f:
            json.dump({"train_loss": float(train_loss), "miou": float(miou),
                       "param_sum": param_sum}, f)
    print("MH_WORKER_DONE", mode, flush=True)


if __name__ == "__main__":
    main()
