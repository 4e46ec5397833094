"""Batch-mixing augmentations (data/mix.py): CutMix box semantics,
mosaic quadrant stitching, per-sample gating, and the PostFetch wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_segmentation_tpu.data.mix import cutmix, make_mix_fn, mosaic


def _batch(b=6, h=32, w=40, seed=0):
    r = np.random.RandomState(seed)
    images = jnp.asarray(r.randint(0, 255, (b, h, w, 3), np.uint8))
    segs = jnp.asarray(r.randint(0, 5, (b, h, w), np.int32))
    return images, segs


def test_cutmix_p0_identity():
    images, segs = _batch()
    out_i, out_s = cutmix(jax.random.PRNGKey(0), images, segs, 0.0)
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(images))
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(segs))


def test_cutmix_box_is_rect_from_next_sample():
    images, segs = _batch()
    out_i, out_s = cutmix(jax.random.PRNGKey(3), images, segs, 1.0)
    out_i, out_s = np.asarray(out_i), np.asarray(out_s)
    donor_i = np.roll(np.asarray(images), -1, axis=0)
    donor_s = np.roll(np.asarray(segs), -1, axis=0)
    changed_any = False
    for b in range(images.shape[0]):
        # every output pixel is either original or donor, and the donor
        # region applies the SAME mask to image and seg
        from_donor = (out_i[b] != np.asarray(images)[b]).any(-1)
        ok = from_donor[..., None]
        np.testing.assert_array_equal(
            out_i[b], np.where(ok, donor_i[b], np.asarray(images)[b]))
        # seg changed => inside the image-donor region (identical donor
        # pixels can mask the reverse direction)
        seg_changed = out_s[b] != np.asarray(segs)[b]
        assert not (seg_changed & ~from_donor &
                    (donor_s[b] != np.asarray(segs)[b])).any()
        if from_donor.any():
            changed_any = True
            # the changed set is contained in a rectangle whose interior
            # rows/cols all change (rect box up to identical-pixel noise)
            rows = np.where(from_donor.any(1))[0]
            cols = np.where(from_donor.any(0))[0]
            rect = np.zeros_like(from_donor)
            rect[rows.min():rows.max() + 1, cols.min():cols.max() + 1] = 1
            assert (from_donor <= rect).all()
    assert changed_any


def test_mosaic_quadrants():
    images, segs = _batch(b=5)
    out_i, out_s = mosaic(jax.random.PRNGKey(1), images, segs, 1.0)
    out_i, out_s = np.asarray(out_i), np.asarray(out_s)
    im = np.asarray(images)
    sg = np.asarray(segs)
    b, h, w = sg.shape
    for i in range(b):
        # recover the stitch center from the first row/col that switches
        # to a donor: every pixel must match one of the 4 donors in the
        # exact quadrant layout for SOME (cy, cx) in [0.25, 0.75]
        found = False
        for cy in range(h // 4, 3 * h // 4 + 1):
            if not (out_i[i, :cy, 0] == im[i, :cy, 0]).all():
                continue
            for cx in range(w // 4, 3 * w // 4 + 1):
                tl = (out_i[i, :cy, :cx] == im[i, :cy, :cx]).all()
                tr = (out_i[i, :cy, cx:] == im[(i + 1) % b, :cy, cx:]).all()
                bl = (out_i[i, cy:, :cx] == im[(i + 2) % b, cy:, :cx]).all()
                br = (out_i[i, cy:, cx:] == im[(i + 3) % b, cy:, cx:]).all()
                if tl and tr and bl and br:
                    st = ((out_s[i, :cy, :cx] == sg[i, :cy, :cx]).all() and
                          (out_s[i, :cy, cx:] ==
                           sg[(i + 1) % b, :cy, cx:]).all() and
                          (out_s[i, cy:, :cx] ==
                           sg[(i + 2) % b, cy:, :cx]).all() and
                          (out_s[i, cy:, cx:] ==
                           sg[(i + 3) % b, cy:, cx:]).all())
                    assert st, "seg stitched with a different center"
                    found = True
                    break
            if found:
                break
        assert found, f"sample {i}: no valid mosaic center found"


def test_gating_is_per_sample():
    images, segs = _batch(b=64)
    out_i, _ = cutmix(jax.random.PRNGKey(7), images, segs, 0.5)
    changed = (np.asarray(out_i) != np.asarray(images)).any((1, 2, 3))
    assert 5 < changed.sum() < 59  # ~Binomial(64, .5) minus no-op boxes


def test_make_mix_fn_none_and_dtype():
    assert make_mix_fn(0.0, 0.0) is None
    fn = make_mix_fn(cutmix_p=1.0, mosaic_p=1.0)
    images, segs = _batch()
    out_i, out_s = fn(jax.random.PRNGKey(0), images, segs)
    assert out_i.dtype == images.dtype and out_s.dtype == segs.dtype
    assert out_i.shape == images.shape and out_s.shape == segs.shape


def test_postfetch_applies_mix():
    """PostFetch(mix_fn=...) mixes before normalize; the program still
    jits and the mixed pixels come from the batch itself."""
    from pytorch_segmentation_tpu.data.loader import Batch
    from pytorch_segmentation_tpu.data.pipeline import PostFetch

    images, segs = _batch(b=4, h=16, w=16)
    pf = PostFetch(mix_fn=make_mix_fn(cutmix_p=1.0), dtype=jnp.float32)
    x, s, valid = pf(Batch(images=np.asarray(images),
                           segs=np.asarray(segs), valid=4))
    assert x.shape == (4, 16, 16, 3) and s.shape == (4, 16, 16)
    # normalized output: reconstruct uint8 and check each pixel belongs
    # to {self, next} at its own position
    from pytorch_segmentation_tpu.data.datasets import (IMAGENET_MEAN,
                                                        IMAGENET_STD)
    rec = np.asarray(x) * np.asarray(IMAGENET_STD) + np.asarray(
        IMAGENET_MEAN)
    rec = np.clip(np.round(rec), 0, 255).astype(np.uint8)
    im = np.asarray(images)
    donor = np.roll(im, -1, axis=0)
    match = ((rec == im).all(-1) | (rec == donor).all(-1))
    assert match.all()
    np.testing.assert_array_equal(
        np.asarray(s) >= 0, np.ones_like(np.asarray(s), bool))
