"""Misc pipeline: multi-scale size enumeration, Fetcher error propagation,
LR schedules, runtime setup."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_segmentation_tpu.data.loader import Batch, DataLoader, Fetcher
from pytorch_segmentation_tpu.data.resize_host import multi_scale_sizes


def test_multi_scale_sizes_match_reference_formula():
    """Reference: h = int(h*scale/32)*32, scale ~ U(0.7, 1.5)
    (utils/datasets.py:206-212). Every enumerated size must be reachable
    and snapped to /32."""
    sizes = multi_scale_sizes((320, 320))
    assert all(h % 32 == 0 and w % 32 == 0 for h, w in sizes)
    assert (320, 320) in sizes
    assert min(s[0] for s in sizes) == int(320 * 0.7 / 32) * 32  # 224
    assert max(s[0] for s in sizes) == int(320 * 1.5 / 32) * 32  # 480
    # scales drive both axes together
    assert all(h == w for h, w in sizes)


class _BoomDataset:
    classes = ["a"]

    def __len__(self):
        return 4

    def __getitem__(self, i):
        if i >= 2:
            raise RuntimeError("boom")
        return (np.zeros((8, 8, 3), np.uint8), np.zeros((8, 8), np.uint8))


def test_fetcher_propagates_worker_errors():
    loader = DataLoader(_BoomDataset(), batch_size=2, num_workers=1)
    fetcher = Fetcher(loader)
    with pytest.raises(RuntimeError, match="boom"):
        for _ in fetcher:
            pass


class _SlowDataset:
    def __len__(self):
        return 64

    def __getitem__(self, i):
        return (np.zeros((8, 8, 3), np.uint8), np.zeros((8, 8), np.uint8))


def test_fetcher_abandoned_iteration_no_hang():
    """Breaking out of a Fetcher mid-epoch (exception/KeyboardInterrupt in
    the train loop) must not deadlock teardown: the producer thread used to
    block forever in q.put with the consumer gone, hanging the generator's
    close()/join. Passing = this returns within the joins' bounded waits."""
    import threading
    loader = DataLoader(_SlowDataset(), batch_size=2, num_workers=1)
    fetcher = Fetcher(loader, prefetch=1)
    before = threading.active_count()
    for _ in range(3):
        it = iter(fetcher)
        next(it)
        it.close()  # GeneratorExit at the yield -> finally join
    # producer threads actually exited (bounded wait for the 0.1s put poll)
    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before


def test_lr_schedules_construct(synthetic_coco):
    import os.path as osp

    from pytorch_segmentation_tpu.data import CocoDataset, Fetcher, PostFetch
    from pytorch_segmentation_tpu.engine import Trainer
    from pytorch_segmentation_tpu.models import UNet

    ds = CocoDataset(osp.join(synthetic_coco, "val.json"), img_size=(32, 32),
                     augments=False)
    loader = DataLoader(ds, batch_size=8, num_workers=1)
    t = Trainer(UNet(num_classes=3, dtype=jnp.float32),
                Fetcher(loader, PostFetch()), lr=1e-2, lr_schedule="cosine",
                warmup_steps=5, total_steps=100, log=False)
    assert t.state is not None


def test_loader_epoch_reshuffle(synthetic_coco):
    import os.path as osp

    from pytorch_segmentation_tpu.data import CocoDataset

    ds = CocoDataset(osp.join(synthetic_coco, "train.json"),
                     img_size=(32, 32), augments=False)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=5)
    o1 = list(loader._local_indices())
    loader.epoch += 1
    o2 = list(loader._local_indices())
    assert sorted(o1) == sorted(o2)
    assert o1 != o2  # different epoch -> different order
    loader.epoch -= 1
    assert list(loader._local_indices()) == o1  # same epoch reproducible


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    import jax
    import jax.numpy as jnp

    from pytorch_segmentation_tpu.engine.checkpoint import (load_checkpoint,
                                                            restore_into,
                                                            save_checkpoint)
    params = {"conv": {"kernel": jnp.zeros((3, 3, 4, 8))}}
    path = str(tmp_path / "x.ckpt")
    save_checkpoint(path, params, {}, epoch=3, best_miou=0.5)
    ckpt = load_checkpoint(path)
    assert ckpt["epoch"] == 3 and abs(ckpt["best_miou"] - 0.5) < 1e-9
    ok = restore_into(params, ckpt["model"])
    assert jax.tree.leaves(ok)[0].shape == (3, 3, 4, 8)
    bad_template = {"conv": {"kernel": jnp.zeros((3, 3, 4, 16))}}
    with pytest.raises(ValueError, match="shape"):
        restore_into(bad_template, ckpt["model"])


def test_split_coco_json(tmp_path, synthetic_coco):
    """split_coco_json partitions images + their annotations exactly, and
    the resulting train.json loads through CocoDataset."""
    import json
    import os.path as osp
    import sys
    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    from split_coco_json import split_coco_json
    from pytorch_segmentation_tpu.data import CocoDataset

    src = json.load(open(osp.join(synthetic_coco, "train.json")))
    merged = str(tmp_path / "coco.json")
    json.dump(src, open(merged, "w"))
    train_p, val_p = split_coco_json(merged, ratio=0.75, seed=1,
                                     out_dir=str(tmp_path))
    tr = json.load(open(train_p))
    va = json.load(open(val_p))
    assert len(tr["images"]) + len(va["images"]) == len(src["images"])
    tr_ids = {im["id"] for im in tr["images"]}
    va_ids = {im["id"] for im in va["images"]}
    assert not tr_ids & va_ids
    # annotations follow their image, none lost
    assert (len(tr["annotations"]) + len(va["annotations"])
            == len(src["annotations"]))
    assert all(a["image_id"] in tr_ids for a in tr["annotations"])
    assert tr["categories"] == src["categories"]
    # images live in synthetic_coco; the dataset resolves file_name
    # relative to the json's directory, so point it at the source dir
    json.dump(tr, open(osp.join(synthetic_coco, "split_train.json"), "w"))
    ds = CocoDataset(osp.join(synthetic_coco, "split_train.json"),
                     img_size=(64, 64), augments=False)
    assert len(ds) == len(tr["images"])
    img, seg = ds[0][:2]
    assert img.shape[:2] == (64, 64)
