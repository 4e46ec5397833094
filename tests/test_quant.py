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


@pytest.fixture()
def all_layers_quantized():
    """Pin the per-layer gate to 0 so the unit tests' tiny convs (K =
    k*k*cin below the shipped threshold) actually exercise the int8 math
    instead of being gated to the bf16 path."""
    with quant.quant_min_k(0):
        yield


@pytest.mark.parametrize("mode", ["int8", "int8dyn"])
def test_convnormact_int8_close(mode, rng, all_layers_quantized):
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


def test_depthwise_stays_unquantized(rng, all_layers_quantized):
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


def test_quant_mode_does_not_leak_into_training(rng, all_layers_quantized):
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


def test_quant_deeplab_dilated_close(rng, all_layers_quantized):
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


def test_quant_composes_with_conv_bn_fuse(rng, all_layers_quantized):
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


def test_quant_gate_skips_floor_bound(rng):
    """The per-layer gate (blocks._QUANT_MIN_K): a conv with contraction
    K = k*k*cin below the threshold takes the normal path BITWISE even in
    int8 mode; dropping the threshold to 0 quantizes it."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    m = ConvNormAct(16, kernel_size=3, dtype=jnp.float32)  # K = 72
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y_ref = m.apply(v, x, train=False)
    with quant.quant_min_k(1152), quant.quant_mode("int8dyn"):
        y_gated = m.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_gated), np.asarray(y_ref))
    with quant.quant_min_k(0), quant.quant_mode("int8dyn"):
        y_q = m.apply(v, x, train=False)
    assert float(jnp.max(jnp.abs(y_q - y_ref))) > 0.0  # really quantized


def test_eval_step_int8_calibrated(rng):
    """make_eval_step(quant=True) called with the quant_stats collection
    (the test.py --int8 --calib-batches path) evaluates the CALIBRATED
    int8 forward: finite masked loss, counts summing to the pixel count,
    loss close to both the bf16 and the dynamic-int8 eval steps."""
    from pytorch_segmentation_tpu.engine.steps import (TrainState,
                                                       make_eval_step)
    from pytorch_segmentation_tpu.models import UNet

    model = UNet(num_classes=3, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    segs = jnp.asarray(rng.integers(0, 3, (2, 32, 32)).astype(np.int32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    qs = quant.calibrate(model, v, [x])
    state = TrainState(step=0, params=v["params"],
                       batch_stats=v.get("batch_stats", {}), opt_state=None,
                       tx=None, apply_fn=model.apply)
    step = make_eval_step(3, quant=True)
    loss_c, tp, fn, fp = step(state, x, segs, 2, qs)
    loss_d, _, _, _ = step(state, x, segs, 2)
    loss_f, _, _, _ = make_eval_step(3, quant=False)(state, x, segs, 2)
    assert np.isfinite(float(loss_c))
    assert float(jnp.sum(tp) + jnp.sum(fn)) == 2 * 32 * 32
    for other in (loss_d, loss_f):
        assert abs(float(loss_c) - float(other)) < 0.05 * max(
            1.0, abs(float(other)))


def test_evaluate_test_calibrated_chain(rng, tmp_path):
    """engine.evaluate.test(quant_stats=...) — the full calibrated eval
    engine — returns a finite mIoU on a synthetic loader, matching the
    dynamic-int8 run's shape of behavior."""
    from pytorch_segmentation_tpu.data.loader import DataLoader, Fetcher
    from pytorch_segmentation_tpu.data.pipeline import PostFetch
    from pytorch_segmentation_tpu.engine.evaluate import test as eval_test
    from pytorch_segmentation_tpu.engine.trainer import ModelBundle
    from pytorch_segmentation_tpu.models import UNet

    class TinySet:
        classes = ["bg", "a", "b"]

        def __len__(self):
            return 8  # one batch of 8: divisible across the 8-device mesh

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            img = r.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            seg = r.integers(0, 3, (32, 32)).astype(np.int32)
            return img, seg

    loader = DataLoader(TinySet(), batch_size=8, num_workers=0)
    fetcher = Fetcher(loader, PostFetch())
    model = UNet(num_classes=3, dtype=jnp.float32)
    xn = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), xn, train=False)
    bundle = ModelBundle(model, v["params"], v.get("batch_stats", {}))
    calib = [images for images, _, _ in fetcher][:1]
    qs = quant.calibrate(model, {"params": bundle.params,
                                 "batch_stats": bundle.batch_stats}, calib)
    miou_c = eval_test(bundle, fetcher, show_first_batch=False, log=False,
                       quant_stats=qs)
    assert np.isfinite(miou_c) and 0.0 <= miou_c <= 1.0


def test_make_infer_fn_calibrated(rng):
    """make_infer_fn(quant_stats=...) — the inference.py --calib path —
    produces probabilities close to the bf16 infer fn's."""
    from pytorch_segmentation_tpu.engine.trainer import ModelBundle
    from pytorch_segmentation_tpu.inference import make_infer_fn
    from pytorch_segmentation_tpu.models import UNet

    model = UNet(num_classes=3, dtype=jnp.float32)
    x_u8 = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    xn = quant._normalize_u8(jnp.asarray(x_u8), False)
    v = model.init(jax.random.PRNGKey(0), xn, train=False)
    bundle = ModelBundle(model, v["params"], v.get("batch_stats", {}))
    qs = quant.calibrate_from_u8(bundle, x_u8)
    p_ref = make_infer_fn(bundle)(x_u8)
    p_cal = make_infer_fn(bundle, quant_stats=qs)(x_u8)
    assert p_cal.shape == p_ref.shape
    assert _cos(p_cal, p_ref) > 0.99, _cos(p_cal, p_ref)


# ---------------------------------------------------------------------------
# Quantization-aware training ("qat" mode; train.py --qat)
# ---------------------------------------------------------------------------

def _fake_quant_act(x):
    s = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6) / 127.0
    return jnp.clip(jnp.round(x / s), -127, 127) * s


def _fake_quant_kernel(w):
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
    return jnp.clip(jnp.round(w / s), -127, 127) * s


def test_qat_forward_matches_explicit_fake_quant(rng, all_layers_quantized):
    """The qat branch must equal the NORMAL train path fed fake-quantized
    input + kernel (same scale formulas as the int8 serving branch)."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    m = ConvNormAct(16, kernel_size=3, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    with quant.quant_mode("qat"):
        y_qat, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert get_quant_mode() is None
    w_fq = _fake_quant_kernel(v["params"]["conv"]["kernel"])
    v_fq = {**v, "params": {**v["params"],
                            "conv": {"kernel": w_fq}}}
    y_exp, _ = m.apply(v_fq, _fake_quant_act(x), train=True,
                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_qat), np.asarray(y_exp),
                               atol=1e-5, rtol=1e-5)


def test_qat_gradients_flow_through_ste(rng, all_layers_quantized):
    """Straight-through estimator: gradients under qat are nonzero, finite,
    and directionally close to the unquantized gradients."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    m = ConvNormAct(8, kernel_size=3, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params, mode):
        def run():
            y, _ = m.apply({**v, "params": params}, x, train=True,
                           mutable=["batch_stats"])
            return jnp.sum(y ** 2)
        if mode is None:
            return run()
        with quant.quant_mode(mode):
            return run()

    g_plain = jax.grad(loss)(v["params"], None)
    g_qat = jax.grad(loss)(v["params"], "qat")
    for gp, gq in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_qat)):
        assert bool(jnp.all(jnp.isfinite(gq)))
        assert float(jnp.sum(jnp.abs(gq))) > 0.0
        assert _cos(gp, gq) > 0.95, _cos(gp, gq)


def test_qat_inactive_at_eval_and_below_gate(rng):
    """qat must not touch eval traces (train=False) at all, and the
    per-layer K gate applies: a K < _QUANT_MIN_K conv trains unquantized."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    m = ConvNormAct(8, kernel_size=3, dtype=jnp.float32)  # K = 36 << 576
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y_ref = m.apply(v, x, train=False)
    with quant.quant_mode("qat"):
        y_eval = m.apply(v, x, train=False)
        y_train, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(y_ref))
    y_train_ref, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y_train),
                                  np.asarray(y_train_ref))


def test_qat_train_step_e2e(rng, all_layers_quantized):
    """make_train_step(qat=True) trains a real model: losses finite and
    decreasing-ish, params move, and the fake quant is actually active
    (loss differs from the plain step on identical inputs)."""
    import optax

    from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                       make_train_step)
    from pytorch_segmentation_tpu.models import UNet

    model = UNet(num_classes=3, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    segs = jnp.asarray(rng.integers(0, 3, (2, 32, 32)).astype(np.int32))
    tx = optax.adam(1e-3)  # sgd 1e-2+momentum diverges on random data
    s_qat = create_train_state(model, jax.random.PRNGKey(0), x[:1], tx)
    s_plain = create_train_state(model, jax.random.PRNGKey(0), x[:1], tx)
    step_qat = make_train_step(qat=True, donate=False)
    step_plain = make_train_step(donate=False)
    _, l_plain = step_plain(s_plain, x, segs)
    losses = []
    for _ in range(3):
        s_qat, loss = step_qat(s_qat, x, segs)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # SGD on a fixed batch must descend
    assert abs(losses[0] - float(l_plain)) > 1e-7  # fake quant active
    moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         s_qat.params, s_plain.params)
    assert max(jax.tree.leaves(moved)) > 0.0


def test_quant_noop_on_model_without_quantizable_convs(rng):
    """A model that creates NO quant_stats variables (SegFormer: the
    split-fuse decoder distributes its only eligible 1x1 conv, and the
    transformer encoder has no ConvNormAct) must calibrate to an empty
    collection and serve under int8/int8dyn as a plain bf16-path no-op
    instead of KeyError-ing (regression: quant.calibrate returned
    mut["quant_stats"] unconditionally)."""
    from pytorch_segmentation_tpu.models import SegFormer

    m = SegFormer(num_classes=3, variant="tiny", dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    qs = quant.calibrate(m, v, [x])
    assert jax.tree.leaves(qs) == []
    base = m.apply(v, x, train=False)
    with quant.quant_mode("int8"):
        got = m.apply({**v, "quant_stats": qs}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base))
    with quant.quant_mode("int8dyn"):
        got = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base))
