"""On-device augmentation: shape/dtype invariants, image-mask geometric
consistency, determinism, value ranges."""

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
