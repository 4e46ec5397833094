"""--ignore-index (train.py/test.py) + the idimg dataset: torch
cross_entropy(ignore_index=) semantics through the loss builder, ignored
pixels excluded from the eval confusion counts, and the Cityscapes/ADE20K
grayscale-id label convention end to end."""

import os
import os.path as osp

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pytorch_segmentation_tpu.engine.steps import TrainState, make_eval_step
from pytorch_segmentation_tpu.ops.loss import build_loss

NC = 3


class _FixedLogits:
    """apply_fn stub: upsampling-free 'model' that projects RGB with a
    fixed kernel so eval-step tests control the logits exactly."""

    def __init__(self, kernel):
        self.kernel = jnp.asarray(kernel, jnp.float32)  # [3, C]

    def __call__(self, variables, images, train=False):
        return images.astype(jnp.float32) @ self.kernel


def test_eval_step_ignore_index_matches_numpy(rng):
    apply_fn = _FixedLogits(rng.standard_normal((3, NC)))
    state = TrainState(step=0, params={}, batch_stats={}, opt_state=None,
                       tx=None, apply_fn=apply_fn)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    segs = rng.integers(0, NC, (2, 8, 8)).astype(np.int32)
    segs[0, :3, :] = 255  # ignored region
    segs[1, 5, 5] = 255

    loss, tp, fn, fp = make_eval_step(NC, ignore_index=255)(
        state, x, jnp.asarray(segs), jnp.array(2))

    logits = np.asarray(apply_fn({}, x))
    pred = logits.argmax(-1)
    valid = segs != 255
    cm = np.zeros((NC, NC))
    for t, p in zip(segs[valid].ravel(), pred[valid].ravel()):
        cm[t, p] += 1
    np.testing.assert_allclose(np.asarray(tp), np.diagonal(cm))
    np.testing.assert_allclose(np.asarray(fn), cm.sum(1) - np.diagonal(cm))
    np.testing.assert_allclose(np.asarray(fp), cm.sum(0) - np.diagonal(cm))

    # loss: per-sample masked-mean CE, then mean over samples — each
    # sample's term equals torch cross_entropy(ignore_index=255)
    per = []
    for b in range(2):
        t = torch.from_numpy(
            np.transpose(logits[b:b + 1], (0, 3, 1, 2))).float()
        per.append(float(F.cross_entropy(
            t, torch.from_numpy(segs[b:b + 1]).long(), ignore_index=255)))
    np.testing.assert_allclose(float(loss), np.mean(per), rtol=1e-5)


def test_eval_step_ignore_composes_with_sample_padding(rng):
    """Padded tail samples AND ignored pixels both drop from the counts."""
    apply_fn = _FixedLogits(rng.standard_normal((3, NC)))
    state = TrainState(step=0, params={}, batch_stats={}, opt_state=None,
                       tx=None, apply_fn=apply_fn)
    x = jnp.asarray(rng.standard_normal((3, 4, 4, 3)), jnp.float32)
    segs = rng.integers(0, NC, (3, 4, 4)).astype(np.int32)
    segs[0, 0, :] = 255

    # valid=2: the third sample is padding
    loss, tp, fn, fp = make_eval_step(NC, ignore_index=255)(
        state, x, jnp.asarray(segs), jnp.array(2))
    total = float(np.asarray(tp).sum() + np.asarray(fn).sum())
    assert total == 2 * 16 - 4  # two real samples minus 4 ignored pixels
    assert np.isfinite(float(loss))


def test_build_loss_ignore_plumbing(rng):
    """build_loss('ce', ignore_index=) routes through the full-res
    weighted-CE path (fused-kernel contract excluded) and matches torch;
    losses without a CE term reject the knob."""
    logits = rng.standard_normal((2, 16, 16, NC)).astype(np.float32)
    labels = rng.integers(0, NC, (2, 16, 16)).astype(np.int32)
    labels[:, :4, :] = 255

    loss_fn = build_loss("ce", ignore_index=255)
    ours = float(loss_fn(jnp.asarray(logits), jnp.asarray(labels)))
    t = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    want = float(F.cross_entropy(t, torch.from_numpy(labels).long(),
                                 ignore_index=255))
    np.testing.assert_allclose(ours, want, rtol=1e-5)

    with pytest.raises(ValueError, match="CE term"):
        build_loss("lovasz", ignore_index=255)


def _write_idimg_layout(root, n=4, ignore_band=True):
    os.makedirs(osp.join(root, "images"), exist_ok=True)
    os.makedirs(osp.join(root, "labels"), exist_ok=True)
    names = []
    rng = np.random.default_rng(3)
    for i in range(n):
        img = rng.integers(0, 255, (40, 48, 3)).astype(np.uint8)
        seg = np.zeros((40, 48), np.uint8)
        seg[8:30, 8:30] = 1 + (i % 2)
        if ignore_band:
            seg[:4, :] = 255  # Cityscapes-style void band
        cv2.imwrite(osp.join(root, "images", f"im{i}.jpg"), img)
        cv2.imwrite(osp.join(root, "labels", f"im{i}.png"), seg)
        names.append(f"im{i}.jpg")
    with open(osp.join(root, "train.txt"), "w") as f:
        f.write("\n".join(names))
    with open(osp.join(root, "classes.names"), "w") as f:
        f.write("background\na\nb\n")
    return osp.join(root, "train.txt")


def test_idimg_dataset_roundtrip(tmp_path):
    """IdImgDataset: grayscale ids pass through untouched (incl. 255)
    and survive the nearest-neighbor resize."""
    from pytorch_segmentation_tpu.data import IdImgDataset

    listfile = _write_idimg_layout(str(tmp_path))
    ds = IdImgDataset(listfile, img_size=(48, 40), augments=False)
    assert len(ds) == 4 and ds.classes == ["background", "a", "b"]
    img, seg = ds[0]
    assert img.shape == (40, 48, 3) and seg.shape == (40, 48)
    assert set(np.unique(seg)) <= {0, 1, 2, 255}
    assert (seg[:4, :] == 255).all()  # the void band survives 1:1

    # half-size: nearest keeps the id set (no interpolated values)
    ds2 = IdImgDataset(listfile, img_size=(24, 20), augments=False)
    _, seg2 = ds2[0]
    assert set(np.unique(seg2)) <= {0, 1, 2, 255}


def test_idimg_eval_e2e_with_ignore(tmp_path):
    """test(..., ignore_index=255) over an idimg val set: runs end to end
    through the real eval loop and the 255 band influences neither the
    confusion sums nor the loss (finite mIoU, no 255-class row)."""
    from pytorch_segmentation_tpu.data import (DataLoader, Fetcher,
                                               IdImgDataset, PostFetch)
    from pytorch_segmentation_tpu.engine import test as run_test
    from pytorch_segmentation_tpu.engine.trainer import ModelBundle
    from pytorch_segmentation_tpu.models import UNet

    listfile = _write_idimg_layout(str(tmp_path), n=8)
    ds = IdImgDataset(listfile, img_size=(32, 32), augments=False)
    # batch 8 = the virtual device count (the eval mesh shards batches)
    fetcher = Fetcher(DataLoader(ds, batch_size=8, num_workers=1),
                      PostFetch())
    model = UNet(num_classes=3, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    bundle = ModelBundle(model, v["params"], v["batch_stats"])
    miou = run_test(bundle, fetcher, show_first_batch=False, log=False,
                    ignore_index=255)
    assert 0.0 <= miou <= 1.0
