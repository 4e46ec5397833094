"""Aux tools: find_color_map, voc2dataset, SegImgDataset layout, synthetic
generator, show_batch."""

import json
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from pytorch_segmentation_tpu.data import SegImgDataset, VOC_COLORMAP
from pytorch_segmentation_tpu.data.colormap import colorize_mask


def _make_voc_layout(root, n=3):
    os.makedirs(osp.join(root, "images"), exist_ok=True)
    os.makedirs(osp.join(root, "labels"), exist_ok=True)
    names = []
    for i in range(n):
        img = np.random.default_rng(i).integers(
            0, 255, (40, 40, 3)).astype(np.uint8)
        mask = np.zeros((40, 40), np.uint8)
        mask[10:30, 10:30] = 1 + (i % 2)
        cv2.imwrite(osp.join(root, "images", f"im{i}.jpg"), img)
        cv2.imwrite(osp.join(root, "labels", f"im{i}.png"),
                    colorize_mask(mask, VOC_COLORMAP))
        names.append(f"im{i}.jpg")
    with open(osp.join(root, "train.txt"), "w") as f:
        f.write("\n".join(names))
    return names


def test_find_color_map(tmp_path):
    import find_color_map
    root = str(tmp_path)
    _make_voc_layout(root)
    classes = find_color_map.run(root)
    assert osp.exists(osp.join(root, "classes.names"))
    with open(osp.join(root, "classes.names")) as f:
        lines = [l for l in f.read().split("\n") if l]
    # background + 2 fg colors
    assert len(lines) == 3 == len(classes)
    assert all(len(l.split(",")) == 3 for l in lines)


def test_segimg_dataset(tmp_path):
    root = str(tmp_path)
    _make_voc_layout(root)
    with open(osp.join(root, "classes.names"), "w") as f:
        f.write("\n".join("%d, %d, %d" % tuple(c) for c in VOC_COLORMAP[:3]))
    ds = SegImgDataset(osp.join(root, "train.txt"), img_size=(32, 32),
                       augments=False)
    assert len(ds) == 3
    img, seg = ds[0]
    assert img.shape == (32, 32, 3)
    assert set(np.unique(seg)).issubset({0, 1, 2})


def test_voc2dataset(tmp_path):
    import voc2dataset
    src = tmp_path / "VOCdevkit"
    (src / "VOC2012" / "ImageSets" / "Segmentation").mkdir(parents=True)
    (src / "VOC2012" / "JPEGImages").mkdir(parents=True)
    (src / "VOC2012" / "SegmentationClass").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for name in ("a", "b"):
        cv2.imwrite(str(src / "VOC2012" / "JPEGImages" / f"{name}.jpg"),
                    rng.integers(0, 255, (20, 20, 3)).astype(np.uint8))
        mask = np.zeros((20, 20), np.uint8)
        mask[5:15, 5:15] = 1
        cv2.imwrite(str(src / "VOC2012" / "SegmentationClass" / f"{name}.png"),
                    colorize_mask(mask, VOC_COLORMAP))
    (src / "VOC2012" / "ImageSets" / "Segmentation" / "train.txt").write_text("a\n")
    (src / "VOC2012" / "ImageSets" / "Segmentation" / "val.txt").write_text("b\n")
    out = str(tmp_path / "out")
    voc2dataset.voc2dataset(str(src), out)
    assert osp.exists(osp.join(out, "train.txt"))
    assert osp.exists(osp.join(out, "classes.names"))
    assert osp.exists(osp.join(out, "images", "a.jpg"))
    assert osp.exists(osp.join(out, "labels", "a.png"))
    with open(osp.join(out, "train.txt")) as f:
        assert f.read().strip() == "a.jpg"


def test_show_batch(tmp_path):
    from pytorch_segmentation_tpu.utils.visualize import show_batch
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    preds = rng.integers(0, 3, (4, 32, 32))
    path = str(tmp_path / "batch.png")
    canvas = show_batch(imgs, preds, path=path)
    assert canvas.shape == (4 * 32, 64, 3)
    assert osp.exists(path)


def test_avg_ckpts(tmp_path):
    """tools/avg_ckpts.py: uniform SWA average of checkpoint param trees;
    batch_stats/epoch ride from the last input; structure mismatches and
    missing EMA trees are CLI-grade errors."""
    import pytest

    from pytorch_segmentation_tpu.engine.checkpoint import (load_checkpoint,
                                                            save_checkpoint)
    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "tools"))
    from avg_ckpts import average_checkpoints

    p = {"conv": {"kernel": np.full((2, 2), 1.0, np.float32)}}
    q = {"conv": {"kernel": np.full((2, 2), 3.0, np.float32)}}
    bs1 = {"bn": {"mean": np.array([1.0], np.float32)}}
    bs2 = {"bn": {"mean": np.array([9.0], np.float32)}}
    a, b = str(tmp_path / "a.ckpt"), str(tmp_path / "b.ckpt")
    save_checkpoint(a, p, bs1, epoch=3)
    save_checkpoint(b, q, bs2, epoch=7)
    out = average_checkpoints([a, b])
    np.testing.assert_allclose(out["model"]["conv"]["kernel"], 2.0)
    # batch_stats + epoch from the LAST checkpoint, opt_state dropped
    np.testing.assert_allclose(out["batch_stats"]["bn"]["mean"], 9.0)
    assert out["epoch"] == 7 and out["opt_state"] is None
    # averaged output loads back through the standard checkpoint path
    o = str(tmp_path / "avg.ckpt")
    from flax import serialization
    with open(o, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    assert load_checkpoint(o)["model"]["conv"]["kernel"][0][0] == 2.0
    # no EMA tree -> --ema is an error; structure mismatch -> error
    with pytest.raises(SystemExit):
        average_checkpoints([a, b], use_ema=True)
    c = str(tmp_path / "c.ckpt")
    save_checkpoint(c, {"other": {"kernel": np.ones((2, 2), np.float32)}},
                    bs1)
    with pytest.raises(SystemExit):
        average_checkpoints([a, c])


def test_pseudo_label(tmp_path, monkeypatch):
    """tools/pseudo_label.py: writes a segimg dataset (classes.names +
    images/ + labels/ color PNGs + train.txt) that SegImgDataset loads
    back; at threshold 0 the labels are exactly the teacher's argmax, at
    an impossible threshold everything is skipped."""
    import jax.numpy as jnp

    from pytorch_segmentation_tpu.engine.checkpoint import (
        load_model_bundle, save_checkpoint)
    from pytorch_segmentation_tpu.inference import make_infer_fn
    from pytorch_segmentation_tpu.models import UNet

    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "tools"))
    import pseudo_label

    # a random-init teacher checkpoint
    import jax
    model = UNet(num_classes=3, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    ckpt = str(tmp_path / "teacher.ckpt")
    save_checkpoint(ckpt, v["params"], v["batch_stats"], epoch=1)

    img_dir = tmp_path / "unlabeled"
    os.makedirs(img_dir)
    rng = np.random.default_rng(5)
    for i in range(3):
        cv2.imwrite(str(img_dir / f"u{i}.jpg"),
                    rng.integers(0, 255, (48, 56, 3)).astype(np.uint8))
    out_dir = str(tmp_path / "pseudo")

    monkeypatch.setattr(sys, "argv", [
        "pseudo_label.py", str(img_dir), out_dir, "--model", "unet",
        "--weights", ckpt, "-s", "64", "64", "-nc", "3",
        "--threshold", "0.0", "--min-keep", "0.0", "-bs", "2"])
    pseudo_label.main()

    assert osp.exists(osp.join(out_dir, "classes.names"))
    with open(osp.join(out_dir, "train.txt")) as f:
        kept = [n for n in f.read().split("\n") if n]
    assert sorted(kept) == ["u0.jpg", "u1.jpg", "u2.jpg"]

    # labels == the teacher's argmax at native size (threshold 0)
    bundle = load_model_bundle(UNet(num_classes=3, dtype=jnp.bfloat16),
                               ckpt, (64, 64))
    infer = make_infer_fn(bundle)
    img = cv2.imread(str(img_dir / "u0.jpg"))
    batch = cv2.resize(img, (64, 64))[:, :, ::-1][None].astype(np.uint8)
    p = cv2.resize(np.asarray(infer(batch))[0], (56, 48))
    want = p.argmax(axis=2)
    got_color = cv2.imread(osp.join(out_dir, "labels", "u0.png"))
    from pytorch_segmentation_tpu.data.colormap import mask_from_colors
    got = mask_from_colors(got_color, VOC_COLORMAP)
    assert (got == want).mean() > 0.99  # PNG round-trip is exact; resize
    # order matches the tool, so expect identity up to f32 ties

    # the dataset loads back through the standard segimg path
    ds = SegImgDataset(osp.join(out_dir, "train.txt"), img_size=(32, 32),
                       augments=False)
    assert len(ds) == 3 and len(ds.classes) == 3

    # impossible threshold -> nothing kept
    out2 = str(tmp_path / "pseudo2")
    monkeypatch.setattr(sys, "argv", [
        "pseudo_label.py", str(img_dir), out2, "--model", "unet",
        "--weights", ckpt, "-s", "64", "64", "-nc", "3",
        "--threshold", "1.01", "--min-keep", "0.5"])
    pseudo_label.main()
    with open(osp.join(out2, "train.txt")) as f:
        assert [n for n in f.read().split("\n") if n] == []
