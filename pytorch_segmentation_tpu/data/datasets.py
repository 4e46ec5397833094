"""Host-side datasets (TPU-native redesign of reference utils/datasets.py).

Split of responsibilities, redesigned for the TPU execution model:

  - Host (this module, runs in loader worker threads): decode, BGR->RGB,
    resize / rect-pad to the static `img_size`, rasterize COCO polygons,
    color->id mapping. Everything that needs ragged shapes or file IO.
  - Device (data/augment.py + data/pipeline.py): the entire imgaug
    TRAIN_AUGS augmentation policy (reference utils/datasets.py:26-125) as
    one jitted, batched, per-sample-randomized transform, plus ImageNet
    normalization and multi-scale resizing (post_fetch_fn,
    utils/datasets.py:199-213).

This removes the reference's CPU augmentation bottleneck (its hot
`__getitem__`, SURVEY.md §3.1) — the host only does decode+resize, and the
TPU does the math-heavy augmentation at HBM bandwidth.

Datasets yield (img uint8 [H, W, 3] RGB, seg uint8 [H, W]).

CocoInstance redesign note: the reference augments polygons with imgaug
*before* its random instance crop (utils/datasets.py:346-391). Here the
random instance selection + crop run on the host in pure numpy and the
geometric augmentation is applied *after* cropping, on device. Quantified
equivalence (tests/test_data.py::test_instance_crop_order_equivalence):
the LABEL distribution is exactly order-independent — the selected instance
lies inside the crop window, so warping about the crop center then cropping
yields the identical mask as cropping then warping (measured gap 0.0 over
400 random affine draws). The only divergence is IMAGE background near the
crop edge: on average ~19% of crop pixels (p95 36%) inverse-map outside the
crop window and receive boundary fill here where the reference would show
true out-of-crop image content. Accuracy cost MEASURED (round 5,
tools/parity_augment.py --task instance — paired seeds, identical
geometry/labels, only the ring content differs): ΔmIoU +0.0065 ± 0.0087
in favor of true background over 8 paired seeds (paired t p=0.07 — not
significant at alpha 0.05) on a deliberately ring-heavy synthetic
instance task; see PARITY_AUGMENT.md for the table.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import random

import cv2
import numpy as np

from .colormap import VOC_COLORMAP, mask_from_colors
from .rasterize import fill_polygon, rasterize_annotations

__all__ = [
    "IMG_EXT", "IMAGENET_MEAN", "IMAGENET_STD",
    "BasicDataset", "CocoDataset", "CocoInstance", "SegImgDataset",
]

# pytorch_modules.utils.IMG_EXT contract (used at reference inference.py:25,
# utils/datasets.py:247, find_color_map.py:15)
IMG_EXT = (".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".dng", ".webp")

# RGB-order ImageNet stats (reference utils/datasets.py:202-205)
IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], dtype=np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], dtype=np.float32)


class BasicDataset:
    """Base dataset: resize / rect-pad to static shape (reference
    utils/datasets.py:149-213). `img_size` is (width, height) like the
    reference's `-s` flag.

    cache_images=True (train.py --cache-images) keeps host records in RAM
    after the first epoch: deterministic datasets (CocoDataset,
    SegImgDataset) cache the FINAL static-size (img, seg) record — decode,
    rasterize/color-map and resize all run once; CocoInstance (random
    per-access crop) caches decoded source images only. Opt-in: RAM is
    ~HxWx4 bytes per cached record (513^2 ~ 1 MB/sample). Safe with the
    threaded loader (one shared in-process cache; cached arrays are marked
    read-only, downstream BGR->RGB copies)."""

    # subclasses whose get_data is random per access (CocoInstance) set
    # False: only the image decode is cached, never the record
    deterministic_records = True

    def __init__(self, img_size=(224, 224), augments: bool = True,
                 multi_scale: bool = False, rect: bool = False,
                 cache_images: bool = False):
        if isinstance(img_size, int):
            img_size = (img_size, img_size)
        self.img_size = tuple(int(v) for v in img_size)
        self.rect = rect
        self.multi_scale = multi_scale
        self.augments = augments  # consumed by the device pipeline
        self.cache_images = bool(cache_images)
        self._record_cache: dict = {}
        self._decode_cache: dict = {}
        self.data: list = []
        self.classes: list[str] = []

    # subclasses return (bgr_img HWC uint8, seg HW uint8)
    def get_data(self, idx):
        raise NotImplementedError

    def class_presence(self):
        """Per-image list of sets of present non-background class ids,
        or None when the dataset can't provide it cheaply — consumed by
        repeat-factor balancing (data/loader.py repeat_factors)."""
        return None

    def _imread(self, path, flags=cv2.IMREAD_COLOR):
        """cv2.imread with the opt-in decode cache (GIL-safe dict ops;
        cached arrays are read-only — callers copy before mutating)."""
        if not self.cache_images:
            return cv2.imread(path, flags)
        img = self._decode_cache.get((path, flags))
        if img is None:
            img = cv2.imread(path, flags)
            if img is not None:
                img.setflags(write=False)
            self._decode_cache[(path, flags)] = img
        return img

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        cache_record = self.cache_images and self.deterministic_records
        if cache_record:
            hit = self._record_cache.get(int(idx))
            if hit is not None:
                return hit
        img, seg = self.get_data(idx)
        img = np.ascontiguousarray(img[..., ::-1])  # BGR -> RGB
        tw, th = self.img_size
        h, w = img.shape[:2]
        if self.rect:
            # aspect-keep resize + center pad with the ImageNet mean pixel
            # (reference utils/datasets.py:166-180)
            scale = min(tw / w, th / h)
            nw, nh = int(w * scale), int(h * scale)
            img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_CUBIC)
            seg = cv2.resize(seg, (nw, nh), interpolation=cv2.INTER_NEAREST)
            pad_x, pad_y = tw - nw, th - nh
            left, top = pad_x // 2, pad_y // 2
            img_out = np.empty((th, tw, 3), dtype=np.uint8)
            img_out[...] = IMAGENET_MEAN.round().astype(np.uint8)
            img_out[top:top + nh, left:left + nw] = img
            seg_out = np.zeros((th, tw), dtype=np.uint8)
            seg_out[top:top + nh, left:left + nw] = seg
            img, seg = img_out, seg_out
        else:
            img = cv2.resize(img, (tw, th), interpolation=cv2.INTER_CUBIC)
            seg = cv2.resize(seg, (tw, th), interpolation=cv2.INTER_NEAREST)
        seg = seg.astype(np.uint8)
        if cache_record:
            img.setflags(write=False)
            seg.setflags(write=False)
            self._record_cache[int(idx)] = (img, seg)
        return img, seg


class SegImgDataset(BasicDataset):
    """classes.names colormap + labels/*.png (reference
    utils/datasets.py:216-257)."""

    def __init__(self, path, img_size=224, augments=True, multi_scale=False,
                 rect=False, colormap=VOC_COLORMAP, cache_images=False):
        super().__init__(img_size, augments, multi_scale, rect,
                         cache_images=cache_images)
        self.path = path
        self.colormap = np.asarray(colormap, dtype=np.uint8)
        self._build()
        self.data.sort()

    def _build(self):
        data_dir = osp.dirname(self.path)
        with open(osp.join(data_dir, "classes.names")) as f:
            self.classes = [c for c in f.read().split("\n") if c]
        image_dir = osp.join(data_dir, "images")
        label_dir = osp.join(data_dir, "labels")
        with open(self.path) as f:
            names = [n for n in f.read().split("\n") if n]
        names = list(set(names))
        self.data = [
            (osp.join(image_dir, name),
             osp.join(label_dir, osp.splitext(name)[0] + ".png"))
            for name in names if osp.splitext(name)[1] in IMG_EXT
        ]

    def get_data(self, idx):
        img = self._imread(self.data[idx][0])
        seg_color = self._imread(self.data[idx][1])
        seg = mask_from_colors(seg_color, self.colormap)
        return img, seg

    def class_presence(self):
        """One pass over the label PNGs at startup (decode-only, no
        image reads); ids >= len(classes) (e.g. a 255 void band) are
        dropped."""
        out = []
        nc = len(self.classes)
        for _, label_path in self.data:
            seg = self._read_label(label_path)
            ids = np.unique(seg) if seg is not None else np.empty(0, int)
            out.append({int(c) for c in ids if 0 < c < nc})
        return out

    def _read_label(self, path):
        seg_color = self._imread(path)
        if seg_color is None:
            return None
        return mask_from_colors(seg_color, self.colormap)


class IdImgDataset(SegImgDataset):
    """labels/*.png store CLASS IDS directly in the gray channel — the
    Cityscapes `labelIds` / ADE20K annotation convention — instead of
    palette colors. Same on-disk layout as SegImgDataset (classes.names +
    images/ + labels/*.png + list file), wired as `--dataset idimg`.

    Ids survive untouched through the nearest-neighbor resizes, so the
    255 ignore convention passes straight through — train/eval with
    `--ignore-index 255` to exclude those pixels from the loss and the
    confusion counts. (Rect padding still labels the pad region 0, like
    every dataset here — reference utils/datasets.py:166-180 semantics.)
    """

    def get_data(self, idx):
        img = self._imread(self.data[idx][0])
        seg = self._imread(self.data[idx][1], cv2.IMREAD_GRAYSCALE)
        return img, seg

    def _read_label(self, path):
        return self._imread(path, cv2.IMREAD_GRAYSCALE)


class _CocoBase(BasicDataset):
    def __init__(self, path, img_size=224, augments=True, multi_scale=False,
                 rect=False, cache_images=False):
        super().__init__(img_size, augments, multi_scale, rect,
                         cache_images=cache_images)
        with open(path) as f:
            self.coco = json.load(f)
        self.img_root = osp.dirname(path)
        self._build()
        self.data.sort(key=lambda d: d[0])

    def _build(self):
        self.classes = ["background"] + [c["name"] for c in self.coco["categories"]]
        by_id: dict = {}
        order = []
        for info in self.coco["images"]:
            by_id[info["id"]] = (osp.join(self.img_root, info["file_name"]),
                                 info, [])
            order.append(info["id"])
        for ann in self.coco["annotations"]:
            entry = by_id.get(ann["image_id"])
            if entry is None:
                continue
            if not self._keep_ann(ann, entry[1]):
                continue
            entry[2].append(ann)
        self.data = [(by_id[i][0], by_id[i][2]) for i in order]
        self.data = self._filter(self.data)

    def _keep_ann(self, ann, img_info):
        return True

    def _filter(self, data):
        return data

    def class_presence(self):
        """From the COCO annotations directly (no mask rasterization):
        class id = category_id + 1, matching rasterize_annotations."""
        return [{int(a["category_id"]) + 1 for a in anns}
                for _, anns in self.data]


class CocoDataset(_CocoBase):
    """COCO JSON polygons -> semantic mask (reference
    utils/datasets.py:260-303)."""

    def get_data(self, idx):
        path, anns = self.data[idx]
        img = self._imread(path)
        seg = rasterize_annotations(img.shape[0], img.shape[1], anns)
        return img, seg


class CocoInstance(_CocoBase):
    """Single-instance random-crop dataset (reference
    utils/datasets.py:306-391): pick one valid polygon, crop a random window
    extending up to 100px beyond its bbox, rasterize only that instance.

    Fixes the reference's dense-image-id indexing bug
    (utils/datasets.py:337 indexes coco['images'] by annotation image_id;
    SURVEY.md §2.2) by resolving image info through an id map.
    """

    MIN_EXTENT = 50
    CROP_MARGIN = 100
    deterministic_records = False  # random crop/instance pick per access

    def _keep_ann(self, ann, img_info):
        seg = ann.get("segmentation")
        if not seg:
            return False
        poly = np.asarray(seg, dtype=np.float64).reshape(-1)
        xs, ys = poly[0::2], poly[1::2]
        return (xs.max() < img_info["width"] and ys.max() < img_info["height"]
                and poly.min() >= 0)

    def _filter(self, data):
        return [d for d in data if len(d[1]) > 0]

    def get_data(self, idx):
        path, anns = self.data[idx]
        img = self._imread(path)
        h, w = img.shape[:2]
        # choose a polygon with sufficient extent, like the reference's
        # retry loop (utils/datasets.py:352-361)
        ann = None
        p = None
        for _ in range(len(anns)):
            cand = random.choice(anns)
            pts = np.asarray(cand["segmentation"], dtype=np.float64).reshape(-1, 2)
            pts = pts.astype(np.int64)
            if (pts[:, 0].min() < 0 or pts[:, 1].min() < 0
                    or pts[:, 0].max() >= w or pts[:, 1].max() >= h
                    or pts[:, 0].max() - pts[:, 0].min() < self.MIN_EXTENT
                    or pts[:, 1].max() - pts[:, 1].min() < self.MIN_EXTENT):
                ann, p = cand, pts  # keep as last resort, keep searching
                continue
            ann, p = cand, pts
            break
        m = self.CROP_MARGIN
        x1 = max(0, random.randint(p[:, 0].min() - m, p[:, 0].min()))
        x2 = min(w, random.randint(p[:, 0].max(), p[:, 0].max() + m))
        y1 = max(0, random.randint(p[:, 1].min() - m, p[:, 1].min()))
        y2 = min(h, random.randint(p[:, 1].max(), p[:, 1].max() + m))
        if x2 > x1 and y2 > y1:
            img = img[y1:y2, x1:x2]
            p = p - np.array([[x1, y1]])
        seg = np.zeros(img.shape[:2], dtype=np.uint8)
        fill_polygon(seg, p, int(ann["category_id"]) + 1)
        return img, seg
