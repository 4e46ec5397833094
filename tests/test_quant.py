"""int8 PTQ serving path (pytorch_segmentation_tpu/quant.py).

Covers: ConvNormAct int8/int8dyn numerical closeness, calibration
running-max semantics, depthwise (grouped) convs staying unquantized,
mode isolation (the trace-time switch must not leak into normal traces),
and the full quantized model forward vs bf16 on a real model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_segmentation_tpu import quant
from pytorch_segmentation_tpu.nn.blocks import (ConvNormAct,
                                                SeparableConvNormAct,
                                                get_quant_mode)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


@pytest.mark.parametrize("mode", ["int8", "int8dyn"])
def test_convnormact_int8_close(mode, rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    m = ConvNormAct(16, kernel_size=3, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y_ref = m.apply(v, x, train=False)
    with quant.quant_mode("calib"):
        _, mut = m.apply(v, x, train=False, mutable=["quant_stats"])
    vq = {**v, "quant_stats": mut["quant_stats"]} if mode == "int8" else v
    with quant.quant_mode(mode):
        y_q = m.apply(vq, x, train=False)
    assert _cos(y_q, y_ref) > 0.999
    rel = float(jnp.max(jnp.abs(y_q - y_ref))) / float(jnp.std(y_ref))
    assert rel < 0.2, rel
    assert get_quant_mode() is None  # context restored


def test_calibration_running_max(rng):
    x1 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    x2 = x1 * 3.0
    m = ConvNormAct(8, kernel_size=1, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x1, train=False)
    qs12 = quant.calibrate(m, v, [x1, x2])
    qs21 = quant.calibrate(m, v, [x2, x1])
    a = float(qs12["in_absmax"])
    assert a == float(qs21["in_absmax"])  # order-independent running max
    assert abs(a - float(jnp.max(jnp.abs(x2)))) < 1e-5


def test_depthwise_stays_unquantized(rng):
    """Grouped convs are floor-bound and excluded from the int8 path: the
    depthwise half of SeparableConvNormAct must produce NO quant_stats and
    still run exactly in int8dyn mode (pointwise half quantized)."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 6)).astype(np.float32))
    m = SeparableConvNormAct(12, kernel_size=3, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    with quant.quant_mode("calib"):
        _, mut = m.apply(v, x, train=False, mutable=["quant_stats"])
    stats = mut["quant_stats"]
    assert "pointwise" in stats and "depthwise" not in stats
    y_ref = m.apply(v, x, train=False)
    with quant.quant_mode("int8dyn"):
        y_q = m.apply(v, x, train=False)
    assert _cos(y_q, y_ref) > 0.999


def test_quant_mode_does_not_leak_into_training(rng):
    """train=True must take the normal path even under an active quant
    mode (gradients through round/clip would be zero)."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    m = ConvNormAct(8, kernel_size=3, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        y, _ = m.apply({**v, "params": params}, x, train=True,
                       mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    with quant.quant_mode("int8dyn"):
        g = jax.grad(loss)(v["params"])
    gnorm = float(sum(jnp.sum(jnp.abs(le)) for le in jax.tree.leaves(g)))
    assert gnorm > 0.0  # a quantized trace would have killed the gradient


def test_quant_deeplab_dilated_close(rng):
    """DLV3+ exercises what UNet doesn't: dilated 3x3 convs (ASPP rates,
    os=16 backbone) through the int8 conv path."""
    from pytorch_segmentation_tpu.models import DeepLabV3Plus

    model = DeepLabV3Plus(num_classes=3, backbone_layers=(1, 1, 1, 1),
                          dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    y_ref = model.apply(v, x, train=False)
    with quant.quant_mode("int8dyn"):
        y_q = model.apply(v, x, train=False)
    assert _cos(y_q, y_ref) > 0.98, _cos(y_q, y_ref)


def test_quant_export_stablehlo(rng):
    """The quantized forward must serialize through the StableHLO export
    path (deployment artifact contract, export.py) — int8 convs and the
    rescale chain included — and round-trip to the same probabilities."""
    from jax.export import deserialize

    from pytorch_segmentation_tpu.export import export_stablehlo
    from pytorch_segmentation_tpu.models import UNet

    model = UNet(num_classes=3, dtype=jnp.float32)
    xn = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), xn, train=False)
    qs = quant.calibrate(model, v, [xn])

    with quant.quant_mode("int8"):
        probs_direct = jax.nn.softmax(
            model.apply({**v, "quant_stats": qs}, xn,
                        train=False).astype(jnp.float32), axis=-1)
    blob, mlir = export_stablehlo(model, v["params"],
                                  v.get("batch_stats", {}), (32, 32),
                                  quant_stats=qs)
    assert "i8" in mlir  # the artifact really carries the int8 path
    out = deserialize(blob).call(xn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(probs_direct),
                               rtol=1e-5, atol=1e-6)


def test_quant_composes_with_conv_bn_fuse(rng):
    """Deployment chain: fuse_conv_bn folds BN into the conv kernel
    (export.py), THEN the int8 path quantizes the folded kernel — the
    per-out-channel scales absorb the fold factor, so the composed result
    must still track the unfused bf16 forward."""
    from pytorch_segmentation_tpu.export import fuse_conv_bn
    from pytorch_segmentation_tpu.models import UNet

    model = UNet(num_classes=3, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    y_ref = model.apply(v, x, train=False)
    fp, fs = fuse_conv_bn(v["params"], v.get("batch_stats", {}))
    fused_v = {"params": fp, "batch_stats": fs}
    with quant.quant_mode("int8dyn"):
        y_q = model.apply(fused_v, x, train=False)
    assert _cos(y_q, y_ref) > 0.98, _cos(y_q, y_ref)


def test_eval_step_int8(rng):
    """make_eval_step(quant=True) — the test.py --int8 path — produces
    finite masked loss and confusion counts that sum to the pixel count,
    with loss close to the bf16 eval step's."""
    from pytorch_segmentation_tpu.engine.steps import (TrainState,
                                                       make_eval_step)
    from pytorch_segmentation_tpu.models import UNet

    model = UNet(num_classes=3, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    segs = jnp.asarray(rng.integers(0, 3, (2, 32, 32)).astype(np.int32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    state = TrainState(step=0, params=v["params"],
                       batch_stats=v.get("batch_stats", {}), opt_state=None,
                       tx=None, apply_fn=model.apply)
    loss_q, tp, fn, fp = make_eval_step(3, quant=True)(state, x, segs, 2)
    loss_f, _, _, _ = make_eval_step(3, quant=False)(state, x, segs, 2)
    assert np.isfinite(float(loss_q))
    assert float(jnp.sum(tp) + jnp.sum(fn)) == 2 * 32 * 32
    assert abs(float(loss_q) - float(loss_f)) < 0.05 * max(
        1.0, abs(float(loss_f)))


def test_quant_model_forward_close(rng):
    """Full-model check on UNet (MobileNetV2 backbone: mixes quantized
    pointwise convs with unquantized depthwise): calibrated int8 logits
    track the f32 logits closely, and the public make_quant_mask_fn
    produces masks of the right shape/dtype."""
    from pytorch_segmentation_tpu.engine.trainer import ModelBundle
    from pytorch_segmentation_tpu.models import UNet

    model = UNet(num_classes=3, dtype=jnp.float32)
    x_u8 = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    xn = quant._normalize_u8(jnp.asarray(x_u8), False)
    v = model.init(jax.random.PRNGKey(0), xn, train=False)
    bundle = ModelBundle(model, v["params"], v.get("batch_stats", {}))

    y_ref = model.apply(v, xn, train=False)
    qs = quant.calibrate_from_u8(bundle, x_u8)
    with quant.quant_mode("int8"):
        y_q = model.apply({**v, "quant_stats": qs}, xn, train=False)
    assert _cos(y_q, y_ref) > 0.98, _cos(y_q, y_ref)

    masks = quant.make_quant_mask_fn(bundle, quant_stats=qs)(x_u8)
    assert masks.shape == (2, 32, 32) and masks.dtype == jnp.int32
    ref_masks = jnp.argmax(
        jax.image.resize(y_ref, (2, 32, 32, 3), "bilinear"), -1) \
        if y_ref.shape[1] != 32 else jnp.argmax(y_ref, -1)
    agree = float(jnp.mean((masks == ref_masks.astype(jnp.int32))
                           .astype(jnp.float32)))
    # random weights produce near-tied logits; just require substantial
    # agreement, the logits-cosine above is the real closeness check
    assert agree > 0.5, agree
