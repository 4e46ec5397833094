"""Data pipeline: colormap round-trip, rasterization parity with cv2,
datasets, loader padding, normalization."""

import json
import os.path as osp

import cv2
import jax.numpy as jnp
import pytest
import numpy as np

from pytorch_segmentation_tpu.data import (IMAGENET_MEAN, IMAGENET_STD,
                                           VOC_COLORMAP, CocoDataset,
                                           CocoInstance, DataLoader, Fetcher,
                                           PostFetch, colorize_mask,
                                           mask_from_colors, voc_colormap)
from pytorch_segmentation_tpu.data.rasterize import (_fill_polygon_numpy,
                                                     rasterize_annotations)


def test_voc_colormap_values():
    cm = voc_colormap(32)
    # class 0 black; class 1 = (128,0,0) RGB = (0,0,128) BGR (reference BGR)
    assert tuple(cm[0]) == (0, 0, 0)
    assert tuple(cm[1]) == (0, 0, 128)
    assert tuple(cm[2]) == (0, 128, 0)
    assert cm.shape == (32, 3)


def test_colormap_roundtrip(rng):
    mask = rng.integers(0, 20, (32, 32)).astype(np.uint8)
    colored = colorize_mask(mask, VOC_COLORMAP)
    back = mask_from_colors(colored, VOC_COLORMAP)
    np.testing.assert_array_equal(mask, back)


def test_rasterize_matches_cv2(rng):
    for _ in range(5):
        pts = rng.integers(5, 59, (6, 2)).astype(np.int64)
        ours = np.zeros((64, 64), dtype=np.uint8)
        _fill_polygon_numpy(ours, pts.astype(np.float64), 1)
        ref = np.zeros((64, 64), dtype=np.uint8)
        cv2.fillPoly(ref, [pts.astype(np.int32)], 1, 0)
        inter = np.logical_and(ours == 1, ref == 1).sum()
        union = np.logical_or(ours == 1, ref == 1).sum()
        assert inter / max(union, 1) > 0.93  # scanline vs cv2 edge pixels


def test_coco_dataset(synthetic_coco):
    ds = CocoDataset(osp.join(synthetic_coco, "val.json"), img_size=(64, 64),
                     augments=False)
    assert ds.classes == ["background", "box", "tri"]
    img, seg = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert seg.shape == (64, 64) and seg.dtype == np.uint8
    assert set(np.unique(seg)).issubset({0, 1, 2})


def test_coco_dataset_rect(synthetic_coco):
    ds = CocoDataset(osp.join(synthetic_coco, "val.json"), img_size=(64, 32),
                     augments=False, rect=True)
    img, seg = ds[0]
    assert img.shape == (32, 64, 3)
    assert seg.shape == (32, 64)


def test_coco_instance_single_class(synthetic_coco):
    ds = CocoInstance(osp.join(synthetic_coco, "train.json"),
                      img_size=(64, 64))
    img, seg = ds[0]
    fg = np.unique(seg)
    assert len(fg) <= 2  # background + exactly one instance class


def test_loader_padding_and_valid(synthetic_coco):
    ds = CocoDataset(osp.join(synthetic_coco, "val.json"), img_size=(48, 48),
                     augments=False)
    loader = DataLoader(ds, batch_size=5, shuffle=False, num_workers=2)
    batches = list(loader)
    assert batches[0].images.shape == (5, 48, 48, 3)
    assert batches[0].valid == 5
    assert batches[-1].valid == len(ds) - 5 * (len(batches) - 1)
    assert batches[-1].images.shape[0] == 5  # padded to full batch


def test_loader_sharding(synthetic_coco):
    ds = CocoDataset(osp.join(synthetic_coco, "val.json"), img_size=(32, 32),
                     augments=False)
    l0 = DataLoader(ds, batch_size=2, rank=0, world_size=2)
    l1 = DataLoader(ds, batch_size=2, rank=1, world_size=2)
    i0 = l0._local_indices()
    i1 = l1._local_indices()
    assert len(i0) == len(i1)
    assert set(i0).union(i1) == set(range(len(ds)))


def test_post_fetch_normalization(synthetic_coco):
    ds = CocoDataset(osp.join(synthetic_coco, "val.json"), img_size=(32, 32),
                     augments=False)
    loader = DataLoader(ds, batch_size=2, num_workers=1)
    fetcher = Fetcher(loader, PostFetch())
    images, segs, valid = next(iter(fetcher))
    assert images.dtype == jnp.float32
    assert segs.dtype == jnp.int32
    raw = next(iter(loader))
    expected = (raw.images.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(np.asarray(images), expected, rtol=1e-5,
                               atol=1e-5)


def test_instance_crop_order_equivalence():
    """CocoInstance redesign (datasets.py module note): the LABEL
    distribution must be exactly order-independent — warping the full-frame
    single-instance mask about the crop center and then cropping (reference
    order, utils/datasets.py:346-391) equals cropping first and warping
    inside the crop frame (our order), because the selected instance lies
    inside the crop window. Checked over random ellipse instances and
    random affine draws with cv2 as the oracle."""
    import cv2
    rng = np.random.default_rng(0)
    H = W = 160
    m = 50  # scaled-down analog of the reference's +-100px margin
    for _ in range(25):
        mask = np.zeros((H, W), np.uint8)
        cx, cy = int(rng.integers(50, W - 50)), int(rng.integers(50, H - 50))
        ax, ay = int(rng.integers(10, 30)), int(rng.integers(10, 30))
        cv2.ellipse(mask, (cx, cy), (ax, ay), 0, 0, 360, 1, -1)
        x0, y0 = max(cx - ax - m // 2, 0), max(cy - ay - m // 2, 0)
        x1, y1 = min(cx + ax + m // 2, W), min(cy + ay + m // 2, H)
        ch, cw = y1 - y0, x1 - x0
        angle = float(rng.uniform(-90, 90))
        scale = float(rng.uniform(0.8, 1.2))
        tx = float(rng.uniform(-0.1, 0.1) * cw)
        ty = float(rng.uniform(-0.1, 0.1) * ch)

        crop = mask[y0:y1, x0:x1]
        M = cv2.getRotationMatrix2D((cw / 2, ch / 2), angle, scale)
        M[:, 2] += (tx, ty)
        ours = cv2.warpAffine(crop, M, (cw, ch), flags=cv2.INTER_NEAREST)

        M2 = cv2.getRotationMatrix2D((x0 + cw / 2, y0 + ch / 2), angle,
                                     scale)
        M2[:, 2] += (tx, ty)
        full = cv2.warpAffine(mask, M2, (W, H), flags=cv2.INTER_NEAREST)
        theirs = full[y0:y1, x0:x1]
        np.testing.assert_array_equal(ours, theirs)


def test_cache_images_deterministic_dataset(synthetic_coco, monkeypatch):
    """--cache-images on CocoDataset: records identical to the uncached
    dataset, and after the first pass neither decode nor rasterize runs."""
    path = osp.join(synthetic_coco, "val.json")
    plain = CocoDataset(path, img_size=(64, 64), augments=False)
    cached = CocoDataset(path, img_size=(64, 64), augments=False,
                         cache_images=True)

    want = [plain[i] for i in range(len(plain))]
    got1 = [cached[i] for i in range(len(cached))]
    for (wi, ws), (gi, gs) in zip(want, got1):
        np.testing.assert_array_equal(wi, gi)
        np.testing.assert_array_equal(ws, gs)

    calls = {"imread": 0}
    real_imread = cv2.imread

    def counting(*a, **kw):
        calls["imread"] += 1
        return real_imread(*a, **kw)

    monkeypatch.setattr(cv2, "imread", counting)
    got2 = [cached[i] for i in range(len(cached))]  # second epoch: cache hits
    assert calls["imread"] == 0
    for (a, b), (c, d) in zip(got1, got2):
        assert a is c and b is d  # the very same cached record
    # cached arrays are read-only (shared across the threaded loader)
    with pytest.raises(ValueError):
        got2[0][0][0, 0, 0] = 1


def test_cache_images_coco_instance_decode_only(synthetic_coco, monkeypatch):
    """CocoInstance stays random per access: only the DECODE is cached
    (records never are), so crops still vary epoch to epoch."""
    import random as _random

    from pytorch_segmentation_tpu.data import CocoInstance

    path = osp.join(synthetic_coco, "train.json")
    ds = CocoInstance(path, img_size=(64, 64), cache_images=True)
    _random.seed(0)
    a = ds[0]
    n_decoded = len(ds._decode_cache)
    assert n_decoded >= 1 and not ds._record_cache

    calls = {"imread": 0}
    real_imread = cv2.imread

    def counting(*a, **kw):
        calls["imread"] += 1
        return real_imread(*a, **kw)

    monkeypatch.setattr(cv2, "imread", counting)
    _random.seed(1)
    b = ds[0]
    assert calls["imread"] == 0  # decode cache hit
    assert not ds._record_cache  # record cache never used
    # different random crop windows -> (almost surely) different records
    assert a[0].shape == b[0].shape
    assert not (np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1]))
