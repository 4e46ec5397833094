"""On-device augmentation: shape/dtype invariants, image-mask geometric
consistency, determinism, value ranges."""

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from pytorch_segmentation_tpu.data.augment import AugmentConfig, make_augment_fn


def _batch(rng, b=4, h=48, w=48):
    imgs = rng.integers(0, 256, (b, h, w, 3)).astype(np.uint8)
    segs = np.zeros((b, h, w), dtype=np.uint8)
    segs[:, 10:30, 10:30] = 1
    return jnp.asarray(imgs), jnp.asarray(segs)


def test_shapes_and_ranges(rng):
    fn = make_augment_fn()
    imgs, segs = _batch(rng)
    out_i, out_s = jax.jit(fn)(jax.random.PRNGKey(0), imgs, segs)
    assert out_i.shape == imgs.shape and out_s.shape == segs.shape
    assert out_i.dtype == jnp.float32
    assert float(out_i.min()) >= 0.0 and float(out_i.max()) <= 255.0
    assert set(np.unique(np.asarray(out_s))).issubset({0, 1})


def test_deterministic_per_key(rng):
    fn = make_augment_fn()
    imgs, segs = _batch(rng)
    a1 = fn(jax.random.PRNGKey(7), imgs, segs)
    a2 = fn(jax.random.PRNGKey(7), imgs, segs)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    np.testing.assert_array_equal(np.asarray(a1[1]), np.asarray(a2[1]))
    b = fn(jax.random.PRNGKey(8), imgs, segs)
    assert not np.array_equal(np.asarray(a1[0]), np.asarray(b[0]))


def test_geometric_image_mask_consistency(rng):
    """Flip-only config: warping a mask painted into the image channels must
    match the warped mask exactly (same transform applied to both,
    reference to_deterministic() contract)."""
    cfg = AugmentConfig(p_fliplr=1.0, p_flipud=0.0, p_crop_pad=0.0,
                        p_affine=0.0, p_sometimes=0.0, someof_max=0)
    fn = make_augment_fn(cfg)
    segs = np.zeros((2, 32, 32), dtype=np.uint8)
    segs[:, 4:12, 2:20] = 1
    imgs = (segs * 255).astype(np.uint8)[..., None].repeat(3, axis=-1)
    out_i, out_s = fn(jax.random.PRNGKey(0), jnp.asarray(imgs),
                      jnp.asarray(segs))
    # pure horizontal flip
    np.testing.assert_array_equal(np.asarray(out_s), segs[:, :, ::-1])
    np.testing.assert_allclose(np.asarray(out_i)[..., 0],
                               segs[:, :, ::-1] * 255.0, atol=1e-3)


def test_identity_config_passthrough(rng):
    cfg = AugmentConfig(p_fliplr=0.0, p_flipud=0.0, p_crop_pad=0.0,
                        p_affine=0.0, p_sometimes=0.0, someof_max=0)
    fn = make_augment_fn(cfg)
    imgs, segs = _batch(rng)
    out_i, out_s = fn(jax.random.PRNGKey(0), imgs, segs)
    np.testing.assert_allclose(np.asarray(out_i),
                               np.asarray(imgs, dtype=np.float32), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(segs))


def test_per_sample_randomness(rng):
    fn = make_augment_fn()
    imgs, segs = _batch(rng, b=4)
    same = jnp.asarray(np.tile(np.asarray(imgs[:1]), (4, 1, 1, 1)))
    out_i, _ = fn(jax.random.PRNGKey(3), same, segs)
    out = np.asarray(out_i)
    # identical inputs must diverge across the batch (per-sample keys)
    assert not np.allclose(out[0], out[1])


def test_someof_budget_covers_warps(rng):
    """elastic/piecewise/perspective live INSIDE the SomeOf(0..5) budget
    (reference utils/datasets.py:116-121): with someof_max=0 they can never
    fire, even with p_sometimes=1 — output must be the identity when all
    top-level geometric ops are off."""
    cfg = AugmentConfig(p_fliplr=0.0, p_flipud=0.0, p_crop_pad=0.0,
                        p_affine=0.0, p_sometimes=1.0, someof_max=0)
    fn = make_augment_fn(cfg)
    imgs, segs = _batch(rng)
    for seed in range(3):
        out_i, out_s = fn(jax.random.PRNGKey(seed), imgs, segs)
        np.testing.assert_allclose(np.asarray(out_i),
                                   np.asarray(imgs, dtype=np.float32),
                                   atol=1e-3)
        np.testing.assert_array_equal(np.asarray(out_s), np.asarray(segs))


def test_someof_selects_at_most_max():
    from pytorch_segmentation_tpu.data.augment import _someof_gates, _N_POOL
    cfg = AugmentConfig()
    counts = []
    for seed in range(200):
        g = np.asarray(_someof_gates(jax.random.PRNGKey(seed), cfg))
        assert g.shape == (_N_POOL,)
        counts.append(int(g.sum()))
    assert max(counts) <= cfg.someof_max
    assert min(counts) == 0  # k=0 occurs
    # mean selected ~ E[k] = 2.5
    assert 1.5 < np.mean(counts) < 3.5


def test_warp_order_sampled_per_image(rng):
    """Per-image order sampling (reference Affine order=[0,1]): the default
    config's stochastic-bilinear dither makes some samples differ from the
    pure-nearest warp while the nearest-order samples stay identical (the
    two configs consume identical geometric randomness per sample, so only
    the dither distinguishes them). Also: exact 4-tap bilinear (order=1)
    yields fractional values on a ramp where nearest stays integral."""
    # photo_carry="f32": the default u8 pool entry requantizes the warp
    # output to integers (imgaug-faithful) and would hide the fractional
    # bilinear values this test asserts on
    kw = dict(p_fliplr=0.0, p_flipud=0.0, p_crop_pad=0.0, p_affine=1.0,
              rotate_range=(30.0, 30.0), shear_range=(0.0, 0.0),
              scale_range=(1.0, 1.0), translate_range=(0.0, 0.0),
              p_sometimes=0.0, someof_max=0, photo_carry="f32")
    ramp = np.linspace(0, 255, 32 * 32).reshape(32, 32).astype(np.uint8)
    imgs = jnp.asarray(np.tile(ramp[None, :, :, None], (8, 1, 1, 3)))
    segs = jnp.zeros((8, 32, 32), jnp.uint8)
    key = jax.random.PRNGKey(0)

    out_def = np.asarray(make_augment_fn(AugmentConfig(**kw))(
        key, imgs, segs)[0])
    out_near = np.asarray(make_augment_fn(
        AugmentConfig(image_warp_order=0, **kw))(key, imgs, segs)[0])
    same = np.array([np.array_equal(out_def[i], out_near[i])
                     for i in range(8)])
    assert same.any(), "no nearest-order sample in batch"
    assert (~same).any(), "no dithered (bilinear-order) sample in batch"

    out_bil = np.asarray(make_augment_fn(
        AugmentConfig(image_warp_order=1, **kw))(key, imgs, segs)[0])
    frac = np.abs(out_bil - np.round(out_bil)).max()
    assert frac > 1e-3, "exact bilinear should interpolate fractionally"


def test_u8_pool_carry_requantizes_like_imgaug(rng):
    """Default photo_carry='u8': every pool op's output (and the pool
    entry) is rounded to integer 0..255 — the reference's per-augmenter
    uint8 requantization (imgaug rounds every op output; Affine included).
    The full default-policy output must therefore be integral and in
    range; photo_carry='bf16'/'f32' keep fractional values."""
    cfg = AugmentConfig(someof_max=5)
    imgs, segs = _batch(rng, b=4)
    out = np.asarray(make_augment_fn(cfg)(jax.random.PRNGKey(3), imgs,
                                          segs)[0])
    np.testing.assert_array_equal(out, np.round(out))
    assert out.min() >= 0.0 and out.max() <= 255.0
    out_f32 = np.asarray(make_augment_fn(
        dataclasses.replace(cfg, photo_carry="f32"))(
            jax.random.PRNGKey(3), imgs, segs)[0])
    assert np.abs(out_f32 - np.round(out_f32)).max() > 1e-3


def test_legacy_ops_round4_reconstruction(rng):
    """AugmentConfig(legacy_ops=True) — the round-4 program shapes used by
    tools/bench_regress.py's drift-proof cross-round legs — must still
    produce valid output (conv blur, shift-add 3x3s, scan-of-switch pool,
    f32 kernel out), and the MXU rewrites must stay numerically close to
    the legacy forms under identical keys (same draws, filters verified
    equivalent to <4e-4 at f32; bf16 internals allow ~1 intensity step)."""
    # elastic_alpha=0: the bf16 jitter DRAW (non-legacy) consumes the
    # same key with a different dtype, so nonzero amplitudes would give
    # different (equally valid) coordinate noise and break the pairing
    cfg4 = AugmentConfig(photo_carry="bf16", rng_impl=None,
                         pool_compute="f32", legacy_ops=True,
                         elastic_alpha=(0.0, 0.0))
    cfg4_mxu = dataclasses.replace(cfg4, legacy_ops=False)
    imgs, segs = _batch(rng, b=4)
    a_i, a_s = make_augment_fn(cfg4)(jax.random.PRNGKey(5), imgs, segs)
    b_i, b_s = make_augment_fn(cfg4_mxu)(jax.random.PRNGKey(5), imgs, segs)
    np.testing.assert_array_equal(np.asarray(a_s), np.asarray(b_s))
    assert float(jnp.max(jnp.abs(a_i - b_i))) <= 2.0  # bf16 blur vs f32
    assert a_i.shape == imgs.shape
    assert float(a_i.min()) >= 0.0 and float(a_i.max()) <= 255.0


def test_photometric_order_is_batch_random(rng):
    """Two keys with identical per-sample streams but different order keys
    give different compositions for the same image when several ops fire."""
    cfg = AugmentConfig(p_fliplr=0.0, p_flipud=0.0, p_crop_pad=0.0,
                        p_affine=0.0, someof_max=5)
    fn = make_augment_fn(cfg)
    imgs, segs = _batch(rng, b=2)
    a = np.asarray(fn(jax.random.PRNGKey(0), imgs, segs)[0])
    b = np.asarray(fn(jax.random.PRNGKey(1), imgs, segs)[0])
    assert not np.allclose(a, b)


def test_fast_geometric_mode(rng):
    from pytorch_segmentation_tpu.data.augment import AugmentConfig
    cfg = AugmentConfig(fast_geometric=True, someof_max=0, p_sometimes=0.0)
    fn = jax.jit(make_augment_fn(cfg))
    imgs, segs = _batch(rng, b=4, h=64, w=64)
    out_i, out_s = fn(jax.random.PRNGKey(0), imgs, segs)
    assert out_i.shape == (4, 64, 64, 3) and out_s.shape == (4, 64, 64)
    assert set(np.unique(np.asarray(out_s))).issubset({0, 1})
    assert float(out_i.min()) >= 0.0 and float(out_i.max()) <= 255.0
    # deterministic per key (same compiled fn)
    out2 = fn(jax.random.PRNGKey(0), imgs, segs)
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(out2[0]))


def test_fast_geometric_identity_config(rng):
    from pytorch_segmentation_tpu.data.augment import AugmentConfig
    cfg = AugmentConfig(fast_geometric=True, p_fliplr=0.0, p_flipud=0.0,
                        p_crop_pad=0.0, p_affine=0.0, p_sometimes=0.0,
                        someof_max=0)
    fn = make_augment_fn(cfg)
    imgs, segs = _batch(rng, b=2, h=32, w=32)
    out_i, out_s = fn(jax.random.PRNGKey(1), imgs, segs)
    np.testing.assert_allclose(np.asarray(out_i),
                               np.asarray(imgs, dtype=np.float32), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(segs))


def test_fast_geometric_mask_image_alignment(rng):
    """Same geometric transform applied to image and mask in fast mode."""
    from pytorch_segmentation_tpu.data.augment import AugmentConfig
    cfg = AugmentConfig(fast_geometric=True, p_fliplr=1.0, p_flipud=0.0,
                        p_crop_pad=0.0, p_affine=0.0, p_sometimes=0.0,
                        someof_max=0)
    fn = make_augment_fn(cfg)
    segs = np.zeros((2, 32, 32), dtype=np.uint8)
    segs[:, 4:12, 2:20] = 1
    imgs = (segs * 255).astype(np.uint8)[..., None].repeat(3, axis=-1)
    out_i, out_s = fn(jax.random.PRNGKey(0), jnp.asarray(imgs),
                      jnp.asarray(segs))
    np.testing.assert_array_equal(np.asarray(out_s), segs[:, :, ::-1])
    np.testing.assert_allclose(np.asarray(out_i)[..., 0],
                               segs[:, :, ::-1] * 255.0, atol=1e-3)
