"""ops/resize vs torch.nn.functional.interpolate — the exact-coordinate
parity the loss and decoders depend on (SURVEY.md §7 hard part (d))."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pytorch_segmentation_tpu.ops.resize import resize_bilinear, resize_nearest


def _torch_resize(x_nhwc, size, mode, align_corners=None):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    kw = {} if mode == "nearest" else {"align_corners": align_corners}
    out = F.interpolate(t, size=size, mode=mode, **kw)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)),      # x2 up (UNet decoder)
    ((20, 20), (80, 80)),    # x4 up (DeepLabV3+)
    ((33, 47), (64, 96)),    # odd sizes
    ((16, 16), (7, 5)),      # downsample
])
def test_bilinear_matches_torch(align_corners, in_hw, out_hw, rng):
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw,
                                      align_corners=align_corners))
    ref = _torch_resize(x, out_hw, "bilinear", align_corners)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (16, 16)),
                                          ((15, 10), (7, 21))])
def test_nearest_matches_torch(in_hw, out_hw, rng):
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    ref = _torch_resize(x, out_hw, "nearest")
    np.testing.assert_array_equal(ours, ref)


def test_identity_passthrough(rng):
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(resize_bilinear(jnp.asarray(x), (8, 8), True)), x)


def test_mask_nearest_int():
    m = jnp.arange(16, dtype=jnp.int32).reshape(1, 4, 4)
    out = resize_nearest(m, (8, 8))
    assert out.shape == (1, 8, 8)
    assert out.dtype == jnp.int32


def test_bicubic_matches_torch():
    """resize_bicubic == torch interpolate(mode='bicubic') for both
    align_corners settings, up- and down-scaling (the ViT pos-embedding
    path, nn/backbones/vit.py)."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    from pytorch_segmentation_tpu.ops.resize import resize_bicubic

    rs = np.random.RandomState(0)
    for (h, w), (oh, ow) in (((14, 14), (32, 32)), ((14, 14), (20, 20)),
                             ((9, 7), (5, 4)), ((4, 4), (11, 3))):
        x = rs.randn(2, h, w, 5).astype(np.float32)
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        for align in (False, True):
            ours = np.asarray(resize_bicubic(x, (oh, ow),
                                             align_corners=align))
            ref = F.interpolate(t, size=(oh, ow), mode="bicubic",
                                align_corners=align)
            ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5,
                                       err_msg=f"{(h, w)}->{(oh, ow)} "
                                               f"align={align}")
