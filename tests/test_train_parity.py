"""TRAINING-DYNAMICS parity vs the torch-reconstructed reference.

Extends the forward/gradient golden tests (test_model_golden_parity.py) to
the full optimization loop: starting from identical ported weights, N steps
of SGD+momentum on identical batches must produce matching per-step losses,
matching parameters, and matching BN running statistics. This exercises
everything the ±0.2 mIoU north star depends on that a single forward can't:
train-mode batch-stat normalization, the running-stat momentum update
(torch convention 0.1), the optimizer's momentum-buffer dynamics, and loss
gradients through the whole model (reference loop semantics:
train.py:71-81 + pytorch_modules Trainer)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn.functional as F

from pytorch_segmentation_tpu.engine.steps import (TrainState,
                                                   make_train_step)
from pytorch_segmentation_tpu.models import UNet
from pytorch_segmentation_tpu.ops.loss import compute_loss
from pytorch_segmentation_tpu.utils.port_torch import convert_mobilenetv2

from test_model_golden_parity import _port
from torch_refs import TUNet, randomize_bn_stats

LR, MOMENTUM, N_STEPS = 1e-2, 0.9, 6
NC, BS, HW = 3, 2, 64


def test_sgd_trajectory_parity(rng):
    torch.manual_seed(0)
    tmodel = TUNet(NC)
    randomize_bn_stats(tmodel, seed=3)
    tmodel.train()

    model = UNet(num_classes=NC, dtype=jnp.float32)
    variables = _port(model, tmodel, convert_mobilenetv2)

    tx = optax.sgd(LR, momentum=MOMENTUM)
    params = jax.tree.map(jnp.asarray, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=jax.tree.map(jnp.asarray,
                                                variables["batch_stats"]),
                       opt_state=tx.init(params), tx=tx,
                       apply_fn=model.apply)
    step = make_train_step(loss_fn=compute_loss, accumulate=1, donate=False)

    topt = torch.optim.SGD(tmodel.parameters(), lr=LR, momentum=MOMENTUM)

    batches = [(rng.standard_normal((BS, HW, HW, 3)).astype(np.float32),
                rng.integers(0, NC, (BS, HW, HW)).astype(np.int32))
               for _ in range(N_STEPS)]

    ours, theirs = [], []
    for x, y in batches:
        state, loss = step(state, jnp.asarray(x), jnp.asarray(y))
        ours.append(float(loss))

        topt.zero_grad()
        out = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        tl = F.cross_entropy(out, torch.from_numpy(y).long())
        tl.backward()
        topt.step()
        theirs.append(float(tl))

    # losses must track step for step (drift accumulates in f32; the
    # trajectory diverging would show up within a few steps)
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-4)

    # final weights: spot-check the classifier conv and one encoder conv
    tsd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    k_ours = np.asarray(state.params["cls_conv"]["kernel"])
    k_ref = np.transpose(tsd["cls_conv.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(k_ours, k_ref, rtol=5e-3, atol=5e-4)

    # BN running statistics after N train steps (torch momentum 0.1, with
    # the unbiased-variance running update). Raw activation statistics
    # accumulate trajectory drift faster than the (normalized) loss — both
    # frameworks are exact per step, but f32 reduction-order noise compounds
    # through N optimizer steps — hence the looser tolerance.
    bn_ours = np.asarray(state.batch_stats["up_conv1"]["bn"]["mean"])
    bn_ref = tsd["up_conv1.bn.running_mean"]
    np.testing.assert_allclose(bn_ours, bn_ref, atol=0.03)
    var_ours = np.asarray(state.batch_stats["up_conv1"]["bn"]["var"])
    var_ref = tsd["up_conv1.bn.running_var"]
    np.testing.assert_allclose(var_ours, var_ref, rtol=0.05, atol=0.05)
