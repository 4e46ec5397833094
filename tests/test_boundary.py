"""Boundary IoU (ops/boundary.py, test.py --boundary-iou).

Oracle: a naive numpy erosion (the official boundary-iou-api's
mask_to_boundary with a square structuring element and zero border) —
every band and every confusion sum is checked against it on random masks.
"""

import numpy as np

from pytorch_segmentation_tpu.ops.boundary import (boundary_confusion,
                                                   boundary_iou,
                                                   boundary_pixels,
                                                   mask_to_band)


def _naive_band(mask: np.ndarray, d: int) -> np.ndarray:
    """mask [H, W] bool -> inner boundary band of width d (zero-padded
    square erosion, like the official api's cv2.erode on a 1px border)."""
    h, w = mask.shape
    pad = np.zeros((h + 2 * d, w + 2 * d), bool)
    pad[d:d + h, d:d + w] = mask
    eroded = np.ones_like(mask)
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            eroded &= pad[d + dy:d + dy + h, d + dx:d + dx + w]
    return mask & ~eroded


def test_band_square_is_perimeter_ring():
    m = np.zeros((8, 8), bool)
    m[2:6, 2:6] = True
    band = np.asarray(mask_to_band(m[None], 1))[0]
    expect = m.copy()
    expect[3:5, 3:5] = False  # interior 2x2 survives erosion
    np.testing.assert_array_equal(band, expect)


def test_band_edge_pixels_are_boundary():
    # a mask touching the image edge: zero padding makes edge pixels
    # boundary (the official api's 1-pixel zero border semantics)
    m = np.ones((5, 5), bool)
    band = np.asarray(mask_to_band(m[None], 1))[0]
    expect = np.ones((5, 5), bool)
    expect[1:4, 1:4] = False
    np.testing.assert_array_equal(band, expect)


def test_band_matches_naive_random():
    rs = np.random.RandomState(0)
    for d in (1, 2, 3):
        m = rs.rand(2, 17, 23) > 0.6
        got = np.asarray(mask_to_band(m, d))
        for b in range(2):
            np.testing.assert_array_equal(got[b], _naive_band(m[b], d),
                                          err_msg=f"d={d} b={b}")


def test_confusion_matches_naive_random():
    rs = np.random.RandomState(1)
    nc, d = 4, 2
    pred = rs.randint(0, nc, (3, 19, 21))
    target = rs.randint(0, nc, (3, 19, 21))
    bi, bu = (np.asarray(x) for x in
              boundary_confusion(pred, target, nc, d))
    for c in range(nc):
        inter = uni = 0
        for b in range(3):
            gb = _naive_band(target[b] == c, d)
            pb = _naive_band(pred[b] == c, d)
            inter += (gb & pb).sum()
            uni += (gb | pb).sum()
        assert bi[c] == inter and bu[c] == uni, c


def test_perfect_prediction_scores_one():
    rs = np.random.RandomState(2)
    seg = rs.randint(0, 3, (2, 24, 24))
    bi, bu = boundary_confusion(seg, seg, 3, 1)
    biou = np.asarray(boundary_iou(bi, bu))
    present = np.asarray(bu) > 0
    assert present.any()
    np.testing.assert_allclose(biou[present], 1.0)
    # absent-boundary classes report 0 under the zero-guard
    np.testing.assert_allclose(biou[~present], 0.0)


def test_valid_mask_excludes_pixels():
    rs = np.random.RandomState(3)
    pred = rs.randint(0, 2, (1, 16, 16))
    target = rs.randint(0, 2, (1, 16, 16))
    valid = np.ones((1, 16, 16), bool)
    valid[:, :8] = False
    bi, bu = (np.asarray(x) for x in
              boundary_confusion(pred, target, 2, 1, valid=valid))
    # oracle: zero out the invalid half (reads as background), then bands
    pm = pred.copy()
    tm = target.copy()
    pm[~valid] = -1
    tm[~valid] = -1
    for c in range(2):
        gb = _naive_band(tm[0] == c, 1)
        pb = _naive_band(pm[0] == c, 1)
        assert bi[c] == (gb & pb).sum()
        assert bu[c] == (gb | pb).sum()


def test_boundary_pixels_official_default():
    # 513^2: 0.02 * diag(725.6) ~ 15 px
    assert boundary_pixels(513, 513, 0.02) == 15
    assert boundary_pixels(10, 10, 0.001) == 1  # floor of 1


def test_eval_step_returns_boundary_sums():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from pytorch_segmentation_tpu.engine.steps import (TrainState,
                                                       make_eval_step)

    class Pointwise(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(3, (1, 1))(x)

    model = Pointwise()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 16, 16, 3)), train=False)
    state = TrainState(step=0, params=variables["params"], batch_stats={},
                       opt_state=None, tx=None, apply_fn=model.apply)
    rs = np.random.RandomState(4)
    images = jnp.asarray(rs.randn(2, 16, 16, 3).astype(np.float32))
    segs = jnp.asarray(rs.randint(0, 3, (2, 16, 16)).astype(np.int32))
    step = make_eval_step(3, boundary_ratio=0.05)
    out = step(state, images, segs, 2)
    assert len(out) == 6
    loss, tp, fn, fp, bi, bu = (np.asarray(o) for o in out)
    d = boundary_pixels(16, 16, 0.05)
    pred = np.asarray(jnp.argmax(
        model.apply(variables, images, train=False), -1))
    ebi, ebu = (np.asarray(x) for x in
                boundary_confusion(pred, np.asarray(segs), 3, d))
    np.testing.assert_array_equal(bi, ebi)
    np.testing.assert_array_equal(bu, ebu)


def test_cli_threads_boundary_flag():
    import os.path as osp

    import test as test_cli
    src = open(osp.join(osp.dirname(test_cli.__file__), "test.py")).read()
    assert "--boundary-iou" in src and "boundary_ratio=opt.boundary_iou" in src
