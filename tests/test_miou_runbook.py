"""mIoU-parity runbook chain validation (docs/MIOU_PARITY_RUNBOOK.md).

The north-star parity run is blocked on external artifacts (VOC2012
tarball, torchvision zoo .pth files). This test executes the ENTIRE
runbook command chain on synthetic stand-ins so that, the day the real
files land, only the artifact paths change:

  synthetic VOC2012 tree      -> voc2dataset.voc2dataset()
  (find_color_map runs inside)-> classes.names
  synthetic torchvision .pth  -> port_weights.run()
  ported ckpt                 -> train.train(dataset='segimg', --weights)
  best checkpoint             -> per-epoch eval (engine test()) + log.jsonl

Asserts: the chain runs end to end, loss falls, val mIoU beats random, and
best.ckpt exists — i.e. every link the real parity run needs.
"""

import json
import os
import os.path as osp

import cv2
import numpy as np
import pytest
import torch

from pytorch_segmentation_tpu.data.colormap import VOC_COLORMAP


def _make_synthetic_voc(root, n_train=12, n_val=6, size=96, seed=0):
    """VOCdevkit-shaped tree: JPEGImages + VOC-palette SegmentationClass
    PNGs + ImageSets/Segmentation split files."""
    rng = np.random.default_rng(seed)
    voc = osp.join(root, "VOC2012")
    for d in ("JPEGImages", "SegmentationClass", "ImageSets/Segmentation"):
        os.makedirs(osp.join(voc, d), exist_ok=True)
    splits = {"train.txt": [], "val.txt": []}
    for i in range(n_train + n_val):
        name = f"2012_{i:06d}"
        img = rng.integers(0, 80, (size, size, 3), dtype=np.uint8)
        seg = np.zeros((size, size), np.uint8)
        # one rectangle of class 1, one circle of class 2 (VOC palette ids)
        x, y = rng.integers(8, size - 40, 2)
        w, h = rng.integers(16, 32, 2)
        img[y:y + h, x:x + w] += 100
        seg[y:y + h, x:x + w] = 1
        cx, cy, r = rng.integers(20, size - 20, 2).tolist() + [
            int(rng.integers(8, 16))]
        cv2.circle(img, (cx, cy), r, (220, 210, 40), -1)
        cv2.circle(seg, (cx, cy), r, 2, -1)
        cv2.imwrite(osp.join(voc, "JPEGImages", name + ".jpg"), img)
        # label PNG painted with the exact VOC palette colors (BGR rows of
        # data/colormap.VOC_COLORMAP, matching real SegmentationClass files)
        cv2.imwrite(osp.join(voc, "SegmentationClass", name + ".png"),
                    np.asarray(VOC_COLORMAP, np.uint8)[seg])
        splits["train.txt" if i < n_train else "val.txt"].append(name)
    for fname, names in splits.items():
        with open(osp.join(voc, "ImageSets/Segmentation", fname), "w") as f:
            f.write("\n".join(names))
    return root


@pytest.mark.slow
def test_runbook_chain_synthetic(tmp_path, monkeypatch):
    import port_weights
    import train as train_cli
    import voc2dataset
    from torch_refs import TMobileNetV2

    # runbook step 1: VOC tree -> data/voc layout (+ classes.names)
    devkit = _make_synthetic_voc(str(tmp_path / "VOCdevkit"), n_train=16,
                                 n_val=8)
    data_dir = str(tmp_path / "data_voc")
    voc2dataset.voc2dataset(devkit, data_dir)
    assert osp.exists(osp.join(data_dir, "classes.names"))
    with open(osp.join(data_dir, "classes.names")) as f:
        classes = [c for c in f.read().split("\n") if c]
    assert len(classes) == 3, classes  # bg + 2 palette classes

    # runbook step 2: torchvision-named .pth -> ported checkpoint
    torch.manual_seed(0)
    sd_path = tmp_path / "mobilenet_v2.pth"
    torch.save(TMobileNetV2().state_dict(), sd_path)
    ported = tmp_path / "unet_imagenet.ckpt"
    port_weights.run(str(sd_path), "unet", len(classes), str(ported))
    assert ported.exists()

    # runbook steps 3+4: train with the ported backbone on the segimg
    # layout; per-epoch eval prints/logs val mIoU, best gates the ckpt
    monkeypatch.chdir(tmp_path)  # train() writes weights/ and runs/ in cwd
    trainer = train_cli.train(
        # batch 8: the conftest mesh has 8 virtual devices and the global
        # batch must divide across them
        data_dir, "unet", epochs=6, img_size=[64, 64], batch_size=8,
        accumulate=1, lr=1e-3, adam=True, resume=False,
        weights=str(ported), num_workers=1, multi_scale=False, rect=False,
        mixed_precision=False, notest=False, nosave=False,
        dataset="segimg")

    assert osp.exists("weights/last.ckpt")
    assert osp.exists("weights/best.ckpt")
    records = [json.loads(l) for l in open("runs/log.jsonl")]
    losses = [r["loss"] for r in records if "loss" in r]
    mious = [r["val_miou"] for r in records if "val_miou" in r]
    assert len(losses) == 6 and len(mious) == 6
    assert losses[-1] < losses[0], losses
    # runbook step 5 stand-in: the parity comparison input exists and beats
    # random (3 classes ~ 0.11 mIoU at random)
    assert max(mious) > 0.15, mious
    assert trainer.metrics == max(mious)
