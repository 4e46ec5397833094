"""LR schedules (train.py --lr-schedule): constant / cosine / poly, over
optimizer-update counts."""

import numpy as np
import pytest

from pytorch_segmentation_tpu.engine.trainer import make_lr_schedule


def test_constant():
    assert make_lr_schedule("constant", 1e-3) == 1e-3
    s = make_lr_schedule("constant", 1e-3, warmup_steps=10)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1e-3)
    np.testing.assert_allclose(float(s(500)), 1e-3)


def test_poly():
    s = make_lr_schedule("poly", 1e-2, warmup_steps=0, total_steps=100)
    np.testing.assert_allclose(float(s(0)), 1e-2, rtol=1e-6)
    # the DeepLab power-0.9 curve: lr * (1 - s/T)^0.9
    np.testing.assert_allclose(float(s(50)), 1e-2 * 0.5 ** 0.9, rtol=1e-5)
    np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-12)
    # monotone decreasing
    vals = [float(s(i)) for i in range(0, 101, 10)]
    assert all(a > b for a, b in zip(vals, vals[1:]))


def test_poly_with_warmup():
    s = make_lr_schedule("poly", 1e-2, warmup_steps=10, total_steps=110)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1e-2, rtol=1e-6)
    np.testing.assert_allclose(float(s(60)), 1e-2 * 0.5 ** 0.9, rtol=1e-5)
    np.testing.assert_allclose(float(s(110)), 0.0, atol=1e-12)


def test_cosine():
    s = make_lr_schedule("cosine", 1e-2, warmup_steps=5, total_steps=105)
    np.testing.assert_allclose(float(s(5)), 1e-2, rtol=1e-5)
    assert float(s(105)) < float(s(50)) < float(s(5))


def test_unknown_raises():
    with pytest.raises(ValueError):
        make_lr_schedule("step", 1e-3)
