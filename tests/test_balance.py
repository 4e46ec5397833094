"""Repeat-factor class balancing (data/loader.repeat_factors +
DataLoader(repeat_factors=), datasets' class_presence())."""

import numpy as np

from pytorch_segmentation_tpu.data.loader import DataLoader, repeat_factors


class _Toy:
    """10 samples; class 7 appears only in image 0 (rare), class 1 in
    every image (common)."""

    def __init__(self, n=10):
        self.n = n
        self.presence = [{1, 7} if i == 0 else {1} for i in range(n)]

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        img = np.full((4, 4, 3), idx, np.uint8)
        seg = np.full((4, 4), idx, np.uint8)
        return img, seg

    def class_presence(self):
        return self.presence


def test_repeat_factors_formula():
    ds = _Toy(10)
    rf = repeat_factors(ds.class_presence(), len(ds), t=0.4)
    # class 1: f = 1.0 -> factor 1; class 7: f = 0.1 -> sqrt(0.4/0.1) = 2
    np.testing.assert_allclose(rf[0], 2.0)
    np.testing.assert_allclose(rf[1:], 1.0)


def test_repeat_factors_common_only_is_identity():
    ds = _Toy(10)
    rf = repeat_factors(ds.class_presence(), len(ds), t=0.05)
    np.testing.assert_allclose(rf, 1.0)  # every class above threshold


def test_loader_oversamples_rare_image():
    ds = _Toy(10)
    rf = repeat_factors(ds.class_presence(), len(ds), t=0.4)  # img0 x2
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=False,
                    num_workers=1, seed=3, repeat_factors=rf)
    seen = []
    for batch in dl:
        seen.extend(batch.images[:batch.valid, 0, 0, 0].tolist())
    assert len(seen) == 11                 # 10 + one extra copy of img 0
    assert seen.count(0) == 2
    assert sorted(set(seen)) == list(range(10))


def test_stochastic_rounding_mean():
    ds = _Toy(10)
    rf = np.ones(10)
    rf[0] = 1.5                            # half the epochs: 2 copies
    dl = DataLoader(ds, batch_size=10, shuffle=True, drop_last=False,
                    num_workers=1, seed=0, repeat_factors=rf)
    totals = []
    for _ in range(40):                    # epoch advances inside iter
        n = 0
        for batch in dl:
            n += batch.valid
        totals.append(n)
    mean = np.mean(totals)
    assert 10.1 < mean < 10.9              # E[n] = 10.5
    assert set(totals) == {10, 11}


def test_no_repeat_factors_stream_unchanged():
    """Without repeat_factors the shuffle order matches the historical
    rng stream (permutation of arange == permutation(n))."""
    ds = _Toy(8)
    dl = DataLoader(ds, batch_size=8, shuffle=True, drop_last=False,
                    num_workers=1, seed=5)
    batch = next(iter(dl))
    expected = np.random.default_rng(5 + 0).permutation(8)
    np.testing.assert_array_equal(batch.images[:, 0, 0, 0], expected)


def test_coco_class_presence(tmp_path):
    from pytorch_segmentation_tpu.utils.synthetic import make_synthetic_coco
    from pytorch_segmentation_tpu.data.datasets import CocoDataset

    make_synthetic_coco(str(tmp_path), num_train=6, num_val=2,
                        img_size=64, seed=0)
    ds = CocoDataset(str(tmp_path / "train.json"), img_size=64)
    presence = ds.class_presence()
    assert len(presence) == len(ds)
    rendered_ok = 0
    for i, s in enumerate(presence):
        assert all(0 < c < len(ds.classes) for c in s)
        # presence must agree with the rasterized mask (annotation ids
        # + 1, same mapping as rasterize_annotations)
        _, seg = ds.get_data(i)
        ids = {int(c) for c in np.unique(seg) if c > 0}
        assert ids <= s           # occluded polygons can vanish from seg
        rendered_ok += ids == s
    assert rendered_ok  # and generally they match exactly
