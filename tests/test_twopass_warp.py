"""Separable two-pass lane-gather warp vs the legacy global-gather samplers.

The two-pass warp (augment._sample_two_pass) must reproduce the legacy
samplers' geometry: exactly for axis-aligned maps and 90-degree rotations
(where the separable decomposition is the identity/transpose case), and
within interpolation tolerance for general rotations (separable resampling
vs one-pass 4-tap bilinear differ by the intra-pixel shear term plus one
u8 re-quantization)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_segmentation_tpu.data.augment import (AugmentConfig,
                                                   _sample_nearest_packed,
                                                   _sample_packed,
                                                   _sample_two_pass,
                                                   _twopass_fields,
                                                   _warp_coords,
                                                   make_augment_fn)

N = 33


def _affine_h(scale=1.0, theta=0.0, tx=0.0, ty=0.0, n=N):
    """Forward homography about the image center."""
    c = (n - 1) / 2.0
    cos, sin = np.cos(theta), np.sin(theta)
    rot = np.array([[cos * scale, -sin * scale, 0.0],
                    [sin * scale, cos * scale, 0.0], [0, 0, 1.0]])
    center = np.array([[1, 0, -c], [0, 1, -c], [0, 0, 1.0]])
    uncenter = np.array([[1, 0, c + tx], [0, 1, c + ty], [0, 0, 1.0]])
    return uncenter @ rot @ center


def _data(b=2, n=N, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.integers(0, 256, (b, n, n, 3), np.uint8))
    segs = jnp.asarray(rng.integers(0, 5, (b, n, n), np.uint8))
    return imgs, segs


def _run_twopass(imgs, segs, hmats, use_bil, mode=1, cval=0.0):
    b, n = imgs.shape[0], imgs.shape[1]
    hinv = jnp.asarray(np.stack([np.linalg.inv(h) for h in hmats]),
                       jnp.float32)
    grid = jnp.zeros((b, 5, 5, 2))
    tf, sx, sy, vt = jax.vmap(
        lambda hi, g: _twopass_fields(hi, g, n, n))(hinv, grid)
    return _sample_two_pass(
        imgs, segs, vt, sx, sy, jnp.full((b,), mode, jnp.int32),
        jnp.full((b,), cval, jnp.float32), jnp.full((b,), use_bil, bool),
        tf)


def _run_legacy(imgs, segs, hmats, use_bil, mode=1, cval=0.0):
    b, n = imgs.shape[0], imgs.shape[1]
    disp = jnp.zeros((n, n, 2))
    sy, sx = jax.vmap(
        lambda hm: _warp_coords(hm, disp, n, n))(
            jnp.asarray(np.stack(hmats), jnp.float32))
    modes = jnp.full((b,), mode, jnp.int32)
    cvals = jnp.full((b,), cval, jnp.float32)
    if use_bil:
        return _sample_packed(imgs, segs, sy, sx, modes, cvals,
                              jnp.ones((b,), bool))
    return _sample_nearest_packed(imgs, segs, sy, sx, modes, cvals)


def test_identity_exact():
    imgs, segs = _data()
    hm = [_affine_h() for _ in range(2)]
    for ub in (False, True):
        img, seg = _run_twopass(imgs, segs, hm, ub)
        np.testing.assert_array_equal(np.asarray(img),
                                      imgs.astype(np.float32))
        np.testing.assert_array_equal(np.asarray(seg), segs)


def test_integer_translate_exact():
    imgs, segs = _data()
    hm = [_affine_h(tx=3, ty=-2)] * 2
    for ub in (False, True):
        img, seg = _run_twopass(imgs, segs, hm, ub)
        img_l, seg_l = _run_legacy(imgs, segs, hm, False)
        np.testing.assert_array_equal(np.asarray(img), np.asarray(img_l))
        np.testing.assert_array_equal(np.asarray(seg), np.asarray(seg_l))


def test_fractional_translate_bilinear_matches_4tap():
    """Axis-aligned maps: separable bilinear == one-pass 4-tap bilinear
    exactly (the shear term vanishes); only the u8 re-quantization of the
    pass-1 intermediate remains."""
    imgs, segs = _data()
    hm = [_affine_h(tx=0.3, ty=0.7), _affine_h(scale=1.13, tx=-0.4)]
    img, seg = _run_twopass(imgs, segs, hm, True)
    img_l, seg_l = _run_legacy(imgs, segs, hm, True)
    assert np.abs(np.asarray(img) - np.asarray(img_l)).max() <= 1.0
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(seg_l))


def test_rot90_exact():
    """90-degree rotation: the transpose factoring makes the effective map
    axis-aligned -> exact match with the legacy nearest warp."""
    imgs, segs = _data()
    hm = [_affine_h(theta=np.pi / 2)] * 2
    img, seg = _run_twopass(imgs, segs, hm, False)
    img_l, seg_l = _run_legacy(imgs, segs, hm, False)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img_l))
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(seg_l))


def test_general_rotation_close():
    # smooth image: on band-limited content the separable resampling and
    # the one-pass 4-tap bilinear must agree closely (their difference is
    # the intra-pixel shear term — first order in the signal's gradient)
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:N, 0:N].astype(np.float32)
    base = (127 + 80 * np.sin(xx / 4.0) * np.cos(yy / 5.0)
            + 40 * np.sin((xx + yy) / 7.0))
    imgs = jnp.asarray(np.clip(
        np.stack([np.stack([base + 10 * c for c in range(3)], -1)] * 2),
        0, 255).astype(np.uint8))
    segs = jnp.asarray(rng.integers(0, 5, (2, N, N), np.uint8))
    # interior-mean bounds (3px frame excluded): rotations <= 45 deg agree
    # to quantization level; near-45-deg residuals carry the known
    # separable shear term (worst case of two-pass resampling), still far
    # below the legacy stochastic tap's per-pixel noise
    # seg bounds: the separable map differs from the one-pass map by a
    # sub-pixel shear, so rotated samples flip nearest taps to a NEIGHBOR
    # in the half-pixel ambiguity band (~5% of pixels; locality verified
    # below). Image and mask share taps, so pair consistency is exact.
    cases = [(_affine_h(theta=0.3, scale=1.05, tx=1.2), 1.0, 0.93),
             (_affine_h(theta=0.1), 1.0, 0.96),
             # >45 deg (transpose-factored, ~38 deg residual): shear term
             # peaks -> ~11% neighbor flips
             (_affine_h(theta=-0.9, scale=0.9, ty=-2.1), 4.0, 0.85)]
    for hm_one, bound, seg_bound in cases:
        hm = [hm_one] * 2
        img, seg = _run_twopass(imgs, segs, hm, True)
        img_l, seg_l = _run_legacy(imgs, segs, hm, True)
        diff = np.abs(np.asarray(img) - np.asarray(img_l))[:, 3:-3, 3:-3]
        assert diff.mean() < bound, (diff.mean(), bound)
        seg_agree = (np.asarray(seg) == np.asarray(seg_l)).mean()
        assert seg_agree > seg_bound, (seg_agree, seg_bound)
    seg, seg_l = np.asarray(seg), np.asarray(seg_l)
    # mask nearest-tap disagreements must sit on tap boundaries, i.e. the
    # labels still come from the immediate neighborhood: spot-check via
    # the fraction of pixels whose label exists in the legacy 3x3 patch
    s, sl = np.asarray(seg), np.asarray(seg_l)
    bad = 0
    total = 0
    for bb, ii, jj in zip(*np.nonzero(s != sl)):
        if 2 <= ii < N - 2 and 2 <= jj < N - 2:
            total += 1
            if s[bb, ii, jj] not in sl[bb, ii - 2:ii + 3, jj - 2:jj + 3]:
                bad += 1
    assert total == 0 or bad / total < 0.05, (bad, total)


def test_constant_mode_fill_matches():
    imgs, segs = _data()
    hm = [_affine_h(tx=20.0, ty=15.0)] * 2   # pushes a corner out of range
    img, seg = _run_twopass(imgs, segs, hm, False, mode=0, cval=77.0)
    img_l, seg_l = _run_legacy(imgs, segs, hm, False, mode=0, cval=77.0)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img_l))
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(seg_l))


def test_default_policy_runs_separable():
    """make_augment_fn with separable_warp end to end: shapes, dtypes,
    finiteness, and labels stay in range."""
    cfg = AugmentConfig(separable_warp=True)
    fn = jax.jit(make_augment_fn(cfg))
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.integers(0, 256, (8, 48, 48, 3), np.uint8))
    segs = jnp.asarray(rng.integers(0, 4, (8, 48, 48), np.uint8))
    out_i, out_s = fn(jax.random.PRNGKey(0), imgs, segs)
    assert out_i.shape == (8, 48, 48, 3) and out_s.shape == (8, 48, 48)
    assert np.isfinite(np.asarray(out_i)).all()
    assert 0 <= np.asarray(out_i).min() and np.asarray(out_i).max() <= 255
    assert np.asarray(out_s).min() >= 0 and np.asarray(out_s).max() <= 3
