"""End-to-end: tiny synthetic COCO -> short train -> loss drops & mIoU
improves -> checkpoint -> resume -> eval parity (SURVEY.md §4 e2e strategy,
BASELINE.json config 1)."""

import os.path as osp

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_segmentation_tpu.data import (CocoDataset, DataLoader, Fetcher,
                                           PostFetch)
from pytorch_segmentation_tpu.engine import (ModelBundle, Trainer,
                                             load_checkpoint, test)
from pytorch_segmentation_tpu.models import UNet


@pytest.fixture(scope="module")
def trained(tmp_path_factory, synthetic_coco):
    workdir = str(tmp_path_factory.mktemp("weights"))
    ds = CocoDataset(osp.join(synthetic_coco, "train.json"),
                     img_size=(64, 64), augments=False)
    loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=2, seed=0)
    fetcher = Fetcher(loader, PostFetch())
    model = UNet(num_classes=len(ds.classes), dtype=jnp.float32)
    trainer = Trainer(model, fetcher, workdir=workdir, accumulate=1,
                      adam=True, lr=1e-3, log=False)
    losses = [trainer.step() for _ in range(6)]
    trainer.save(best=True)
    return trainer, losses, workdir, synthetic_coco


def test_loss_decreases(trained):
    _, losses, _, _ = trained
    assert losses[-1] < losses[0] * 0.9, losses


def test_eval_miou_beats_random(trained):
    trainer, _, _, root = trained
    val = CocoDataset(osp.join(root, "val.json"), img_size=(64, 64),
                      augments=False)
    fetcher = Fetcher(DataLoader(val, batch_size=8, num_workers=1),
                      PostFetch())
    miou = test(trainer.model, fetcher, show_first_batch=False, log=False)
    assert miou > 0.15, miou  # 3-class random ~ 0.1 on this data


def test_checkpoint_roundtrip(trained):
    trainer, _, workdir, root = trained
    ckpt = load_checkpoint(osp.join(workdir, "last.ckpt"))
    assert ckpt["epoch"] == trainer.epoch
    val = CocoDataset(osp.join(root, "val.json"), img_size=(64, 64),
                      augments=False)
    fetcher = Fetcher(DataLoader(val, batch_size=8, num_workers=1),
                      PostFetch())
    m1 = test(trainer.model, fetcher, show_first_batch=False, log=False)

    # reload into a fresh trainer via --resume and verify identical eval
    ds = CocoDataset(osp.join(root, "train.json"), img_size=(64, 64),
                     augments=False)
    loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=1)
    tr2 = Trainer(UNet(num_classes=len(ds.classes), dtype=jnp.float32),
                  Fetcher(loader, PostFetch()), workdir=workdir,
                  adam=True, lr=1e-3, resume=True, log=False)
    assert tr2.epoch == trainer.epoch
    m2 = test(tr2.model, fetcher, show_first_batch=False, log=False)
    assert abs(m1 - m2) < 1e-6
