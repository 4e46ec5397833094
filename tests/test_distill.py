"""Knowledge distillation (train.py --distill, engine/steps.distill_loss):
KD-term math, train-step composition with a frozen teacher closure, and
the CLI-level wiring through train.train().
"""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_segmentation_tpu.engine.steps import (create_train_state,
                                                   distill_loss,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import UNet

NC = 3


def test_distill_loss_math(rng):
    s = jnp.asarray(rng.standard_normal((2, 8, 8, NC)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((2, 8, 8, NC)), jnp.float32)
    # identical logits -> exactly zero KL at any temperature
    assert float(distill_loss(s, s, temp=1.0)) == 0.0
    assert float(distill_loss(s, s, temp=4.0)) == 0.0
    # positive otherwise, and the T^2 scaling keeps magnitudes comparable
    kd1 = float(distill_loss(s, t, temp=1.0))
    assert kd1 > 0
    # reference KL computed directly
    pt = jax.nn.softmax(t, -1)
    ref = float(jnp.mean(jnp.sum(
        pt * (jax.nn.log_softmax(t, -1) - jax.nn.log_softmax(s, -1)), -1)))
    np.testing.assert_allclose(kd1, ref, rtol=1e-6)
    # teacher at a coarser grid resizes onto the student's
    t_low = jnp.asarray(rng.standard_normal((2, 4, 4, NC)), jnp.float32)
    assert np.isfinite(float(distill_loss(s, t_low)))


def test_distill_step_composition(rng):
    """Teacher == student weights -> the KD term is 0 and the distilled
    step reproduces the plain step exactly; a different teacher changes
    the loss and the update."""
    model = UNet(num_classes=NC, dtype=jnp.float32)
    x1 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x1, train=False)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    segs = jnp.asarray(rng.integers(0, NC, (2, 32, 32)), jnp.int32)

    def teacher_fn_from(variables):
        return lambda im: model.apply(variables, im, train=False)

    def run(distill_fn, w):
        state = create_train_state(model, jax.random.PRNGKey(0), x1,
                                   optax.sgd(1e-2))
        step = make_train_step(distill_fn=distill_fn, distill_weight=w,
                               donate=False)
        state, loss = step(state, imgs, segs)
        return float(loss), state.params

    base_loss, base_p = run(None, 0.0)
    # NOTE: the student's train-mode forward uses BATCH stats while the
    # eval-mode teacher uses running stats, so same-weights KD is small
    # but nonzero; weight 0 must reproduce the plain step bit-exactly.
    zero_loss, zero_p = run(teacher_fn_from(v), 0.0)
    assert zero_loss == base_loss
    for a, b in zip(jax.tree.leaves(zero_p), jax.tree.leaves(base_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    v2 = model.init(jax.random.PRNGKey(7), x1, train=False)
    kd_loss, kd_p = run(teacher_fn_from(v2), 1.0)
    assert kd_loss > base_loss  # KL > 0 against a different teacher
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(kd_p),
                             jax.tree.leaves(base_p))]
    assert max(diffs) > 0  # the KD gradient actually moved the update


def test_distill_cli_e2e(tmp_path, synthetic_coco, monkeypatch):
    """train.train(distill=...) end to end: a saved teacher checkpoint
    loads, the distilled student trains one epoch with a finite loss."""
    import train as train_cli
    from pytorch_segmentation_tpu.engine.checkpoint import save_checkpoint

    # teacher checkpoint: a (random) unet with the dataset's class count
    model = UNet(num_classes=NC, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    tckpt = str(tmp_path / "teacher.ckpt")
    save_checkpoint(tckpt, v["params"], v["batch_stats"])

    monkeypatch.chdir(tmp_path)  # weights/ land in the tmp dir
    train_cli.train(synthetic_coco, "unet", epochs=1, img_size=[64, 64],
                    batch_size=8, accumulate=1, lr=1e-3, adam=True,
                    resume=False, weights="", num_workers=1,
                    multi_scale=False, rect=False, mixed_precision=False,
                    notest=True, nosave=True, dataset="coco",
                    distill=tckpt, distill_weight=0.5, distill_temp=2.0)
