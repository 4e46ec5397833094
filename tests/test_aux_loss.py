"""Auxiliary-head deep supervision (train.py --aux-loss, models/pspnet.py
aux=True): train-mode tuple output, weighted loss composition in the train
step, aux gradients flowing, and eval-side loading of aux-trained
checkpoints into a no-aux model (train-only params dropped by name)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import PSPNet
from pytorch_segmentation_tpu.ops.loss import compute_loss

NC = 3


def _tiny(aux):
    return PSPNet(num_classes=NC, backbone_layers=(1, 1, 1, 1),
                  dtype=jnp.float32, aux=aux)


def test_aux_output_contract(rng):
    m = _tiny(aux=True)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x[:1], train=False)
    assert "aux_conv" in v["params"] and "aux_cls" in v["params"]

    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert isinstance(out, tuple)
    main, aux = out
    assert main.shape == (2, 64, 64, NC)       # full-res logits
    assert aux.shape == (2, 8, 8, NC)          # layer3 @ os8 (dilated)

    y_eval = m.apply(v, x, train=False)        # eval: single output
    assert not isinstance(y_eval, tuple)


def test_aux_loss_composition_and_grads(rng):
    m = _tiny(aux=True)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, NC, (2, 64, 64)), jnp.int32)
    state = create_train_state(m, jax.random.PRNGKey(0), x[:1],
                               optax.sgd(1e-2))

    step = make_train_step(loss_fn=compute_loss, donate=False,
                           aux_weight=0.4)
    _s, loss = step(state, x, y)

    # manual composition: loss == main CE + 0.4 * aux CE at the same params
    (main, aux), _ = m.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=True, mutable=["batch_stats"])
    want = compute_loss(main, y) + 0.4 * compute_loss(aux, y)
    # jitted step vs eager recomputation: f32 reduction-order noise only
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-4)

    # aux gradients flow (deep supervision reaches the aux head)
    def loss_fn(params):
        (mo, ao), _ = m.apply(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"])
        return compute_loss(mo, y) + 0.4 * compute_loss(ao, y)
    g = jax.grad(loss_fn)(state.params)
    assert float(jnp.abs(g["aux_cls"]["kernel"]).max()) > 0
    # and with weight 0 the aux head gets no gradient
    def loss_fn0(params):
        (mo, ao), _ = m.apply(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"])
        return compute_loss(mo, y)
    g0 = jax.grad(loss_fn0)(state.params)
    assert float(jnp.abs(g0["aux_cls"]["kernel"]).max()) == 0


def test_aux_ckpt_loads_into_plain_model(tmp_path, rng, capsys):
    from pytorch_segmentation_tpu.engine.checkpoint import (
        load_model_bundle, save_checkpoint)

    m = _tiny(aux=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    path = str(tmp_path / "aux.ckpt")
    save_checkpoint(path, v["params"], v["batch_stats"])

    plain = _tiny(aux=False)
    bundle = load_model_bundle(plain, path, (64, 64))
    out = capsys.readouterr().out
    assert "aux_cls" in out and "dropping train-only" in out
    y = plain.apply({"params": bundle.params,
                     "batch_stats": bundle.batch_stats}, x, train=False)
    assert y.shape == (1, 64, 64, NC)


def test_aux_warm_start_from_plain_ckpt(tmp_path, rng, capsys):
    """--weights plain.ckpt --aux-loss W: the warm-start restore fills the
    missing aux modules from init (training them from scratch) instead of
    failing flax's strict missing-key restore."""
    from pytorch_segmentation_tpu.engine.checkpoint import (
        load_checkpoint, restore_into, save_checkpoint)

    plain = _tiny(aux=False)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vp = plain.init(jax.random.PRNGKey(1), x, train=False)
    path = str(tmp_path / "plain.ckpt")
    save_checkpoint(path, vp["params"], vp["batch_stats"])

    m = _tiny(aux=True)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    ckpt = load_checkpoint(path)
    params = restore_into(v["params"], ckpt["model"], allow_missing=True)
    out = capsys.readouterr().out
    assert "kept at init" in out and "aux_cls" in out
    # loaded modules come from the checkpoint, aux stays at init
    np.testing.assert_array_equal(
        np.asarray(params["cls_conv"]["kernel"]),
        np.asarray(vp["params"]["cls_conv"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(params["aux_cls"]["kernel"]),
        np.asarray(v["params"]["aux_cls"]["kernel"]))


def test_upernet_aux_contract(rng):
    """UPerNet aux=True (train.py --aux-loss on upernet): the mmseg-style
    FCN aux head sits on C4 (stride 16); train mode returns the tuple,
    eval mode the single full-res output."""
    from pytorch_segmentation_tpu.models import UPerNet

    m = UPerNet(num_classes=NC, backbone_layers=(1, 1, 1, 1), channels=64,
                dtype=jnp.float32, aux=True)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x[:1], train=False)
    assert "aux_conv" in v["params"] and "aux_cls" in v["params"]
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    main, aux = out
    assert main.shape == (2, 64, 64, NC)
    assert aux.shape == (2, 4, 4, NC)  # C4 @ stride 16
    assert not isinstance(m.apply(v, x, train=False), tuple)


def test_bisenetv2_booster_contract(rng):
    """BiSeNetV2 aux=True: the booster returns a TUPLE of four aux logits
    (stem/GE3/GE4/GE5 taps, resized onto the main grid) and the train
    step sums aux_weight * loss over all of them (engine/steps.py
    tuple-of-aux contract)."""
    from pytorch_segmentation_tpu.models import BiSeNetV2

    m = BiSeNetV2(num_classes=NC, dtype=jnp.float32, aux=True)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, NC, (2, 64, 64)), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), x[:1], train=False)
    for i in range(2, 6):
        assert f"aux{i}_conv" in v["params"] and f"aux{i}_cls" in v["params"]

    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    main, auxs = out
    assert isinstance(auxs, tuple) and len(auxs) == 4
    assert main.shape == (2, 64, 64, NC)
    assert all(a.shape == main.shape for a in auxs)  # resized to main grid
    assert not isinstance(m.apply(v, x, train=False), tuple)

    state = create_train_state(m, jax.random.PRNGKey(0), x[:1],
                               optax.sgd(1e-2))
    step = make_train_step(loss_fn=compute_loss, donate=False,
                           aux_weight=1.0)  # the paper's booster weight
    _s, loss = step(state, x, y)
    (main, auxs), _ = m.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=True, mutable=["batch_stats"])
    want = compute_loss(main, y) + sum(compute_loss(a, y) for a in auxs)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-4)


def test_ocrnet_aux_contract(rng):
    """OCRNet aux=True (train.py --aux-loss): the soft-region logits come
    back as the auxiliary output in train mode (the paper's 0.4-weighted
    cascade). Unlike the other aux families the region head is INTEGRAL
    to the forward pass (it weights the spatial gather), so the param
    tree is identical with and without aux — checkpoints move freely
    between train and eval builds in both directions."""
    import jax.tree_util as jtu

    from pytorch_segmentation_tpu.models import OCRNet

    kw = dict(num_classes=NC, num_branches_list=(2,), base_channels=8,
              ocr_channels=32, key_channels=16, dtype=jnp.float32)
    m = OCRNet(aux=True, **kw)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x[:1], train=False)
    assert "aux_conv" in v["params"] and "aux_cls" in v["params"]

    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    main, aux = out
    assert main.shape == (2, 64, 64, NC)
    assert aux.shape == main.shape  # region logits resized to main grid
    assert not isinstance(m.apply(v, x, train=False), tuple)

    # identical param tree without aux (the region head always exists)
    v_plain = OCRNet(**kw).init(jax.random.PRNGKey(0), x[:1], train=False)
    assert (jtu.tree_structure(v["params"])
            == jtu.tree_structure(v_plain["params"]))
