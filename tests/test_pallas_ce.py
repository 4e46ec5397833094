"""Fused Pallas upsample+CE kernel vs the XLA reference path (interpret mode
on CPU), and deferred-upsample model equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_segmentation_tpu.ops.loss import compute_loss
from pytorch_segmentation_tpu.ops.pallas.softmax_ce import _fused_ce
from pytorch_segmentation_tpu.models import DeepLabV3Plus, HRNet, UNet

from jax.experimental.pallas import tpu as pltpu


@pytest.mark.parametrize("align", [True, False])
def test_fused_ce_forward_matches_reference(align, rng):
    logits = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (2, 64, 64)).astype(np.int32))
    ref = float(compute_loss(logits, labels, align_corners=align))
    with pltpu.force_tpu_interpret_mode():
        fused = float(_fused_ce(logits, labels, (64, 64), align, 16))
    assert abs(fused - ref) < 1e-4, (fused, ref)


def test_fused_ce_ragged_tile(rng):
    """h_out not divisible by tile: padded rows must not contaminate."""
    logits = jnp.asarray(rng.standard_normal((1, 11, 13, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (1, 50, 52)).astype(np.int32))
    ref = float(compute_loss(logits, labels, align_corners=True))
    with pltpu.force_tpu_interpret_mode():
        fused = float(_fused_ce(logits, labels, (50, 52), True, 16))
    assert abs(fused - ref) < 1e-4, (fused, ref)


def test_fused_ce_per_sample_matches_reference(rng):
    """Per-sample mean-CE vector (eval masked-loss path) == per-sample XLA
    CE; masked mean over a ragged final batch == the XLA fallback's loss."""
    from pytorch_segmentation_tpu.ops.pallas.softmax_ce import (
        fused_upsample_ce_per_sample)
    logits = jnp.asarray(rng.standard_normal((4, 16, 16, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (4, 64, 64)).astype(np.int32))
    per = np.asarray(fused_upsample_ce_per_sample(logits, labels,
                                                  interpret=True))
    for i in range(4):
        ref = float(compute_loss(logits[i:i + 1], labels[i:i + 1]))
        assert abs(per[i] - ref) < 1e-4, (i, per[i], ref)
    # masked mean with valid=3 excludes the padded duplicate sample
    masked = float(per[:3].mean())
    ref3 = float(sum(float(compute_loss(logits[i:i + 1], labels[i:i + 1]))
                     for i in range(3)) / 3)
    assert abs(masked - ref3) < 1e-4


def test_fused_ce_gradient_matches(rng):
    logits = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (2, 32, 32)).astype(np.int32))
    ref_grad = jax.grad(
        lambda l: compute_loss(l, labels, align_corners=True))(logits)
    with pltpu.force_tpu_interpret_mode():
        fused_grad = jax.grad(
            lambda l: _fused_ce(l, labels, (32, 32), True, 16))(logits)
    np.testing.assert_allclose(np.asarray(fused_grad), np.asarray(ref_grad),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("model_cls", [UNet, DeepLabV3Plus, HRNet])
def test_deferred_upsample_equivalence(model_cls, rng):
    """resize(low_res_logits) == full_res_logits — the deferred upsample is
    exactly the model's trailing one."""
    from pytorch_segmentation_tpu.ops.resize import resize_bilinear
    full = model_cls(num_classes=3, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    variables = full.init(jax.random.PRNGKey(0), x, train=False)
    y_full = full.apply(variables, x, train=False)
    low = full.clone(full_res_output=False)
    y_low = low.apply(variables, x, train=False)
    assert y_low.shape[1] == 32 // full.output_stride
    y_up = resize_bilinear(y_low, (32, 32),
                           align_corners=full.up_align_corners)
    np.testing.assert_allclose(np.asarray(y_up), np.asarray(y_full),
                               rtol=1e-5, atol=1e-5)


def test_fused_ce_extended_classes_coco81(rng):
    """65..128-class extension (COCO semantic = 81): forward + gradient
    parity with the XLA reference in interpret mode, via the public entry
    so the VMEM-planned gate is what routes to the kernel."""
    from pytorch_segmentation_tpu.ops.pallas.softmax_ce import (
        fused_upsample_ce)
    logits = jnp.asarray(rng.standard_normal((1, 8, 8, 81)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 81, (1, 16, 16)).astype(np.int32))
    ref = float(compute_loss(logits, labels, align_corners=True))
    fused = float(fused_upsample_ce(logits, labels, tile=8, interpret=True))
    assert abs(fused - ref) < 1e-4, (fused, ref)
    ref_grad = jax.grad(
        lambda l: compute_loss(l, labels, align_corners=True))(logits)
    with pltpu.force_tpu_interpret_mode():
        fused_grad = jax.grad(
            lambda l: fused_upsample_ce(l, labels, tile=8, interpret=True))(
                logits)
    np.testing.assert_allclose(np.asarray(fused_grad), np.asarray(ref_grad),
                               rtol=1e-4, atol=1e-6)


def test_extended_class_vmem_gates(rng):
    """The VMEM plan admits COCO-81 at DLV3+'s stride-16 logits and rejects
    the same class count at UNet's stride-2 logits (and anything >128)."""
    from pytorch_segmentation_tpu.ops.pallas.softmax_ce import (
        _VMEM_BUDGET, _bwd_vmem_bytes, _pick_cb, default_tile,
        forward_kernel_fits)
    # class-blocked backward plan, bf16 logits (itemsize 2): only cb
    # classes resident, so both DLV3+ 129^2 and UNet-scale 256^2 fit
    assert _pick_cb(81) == 9          # exact divisor, zero class padding
    assert _pick_cb(100) == 10
    assert _pick_cb(127) == 16        # prime -> pad to 128
    assert _bwd_vmem_bytes(81, 129, 129, 513, 2,
                           default_tile(81)) <= _VMEM_BUDGET
    assert _bwd_vmem_bytes(81, 256, 256, 513, 2,
                           default_tile(81)) <= _VMEM_BUDGET
    # forward holds ALL classes (online softmax): 81@129^2 and the
    # TPU-validated borderline 81@256^2 fit; stride-2 512^2 does not
    assert forward_kernel_fits(81, 129, 129, 513, 2)
    assert forward_kernel_fits(81, 256, 256, 513, 2)
    assert not forward_kernel_fits(81, 512, 512, 1024, 2)
    assert not forward_kernel_fits(129, 8, 8, 16, 2)   # >128 lanes
    assert forward_kernel_fits(21, 256, 256, 513, 2)   # legacy range intact
    # the TRAIN gate is pinned to the largest in-step chip-validated
    # working set: 81@129^2 (DLV3+) and 81@256^2 (UNet stride-2 @512^2,
    # validated at 2.645x by tools/bench_gate256.py) are fused; anything
    # larger than that empirical compile falls back to XLA
    from pytorch_segmentation_tpu.ops.pallas.softmax_ce import (
        _VMEM_BUDGET_TRAIN)
    assert forward_kernel_fits(81, 129, 129, 513, 2,
                               budget=_VMEM_BUDGET_TRAIN)
    assert forward_kernel_fits(81, 256, 256, 512, 2,
                               budget=_VMEM_BUDGET_TRAIN)
    assert not forward_kernel_fits(128, 216, 216, 512, 2,
                                   budget=_VMEM_BUDGET_TRAIN)


def test_fused_ce_cb_mode_small_class_count(rng):
    """set_ce_bwd_mode('cb') — the measurement knob that forces the
    lse-residual forward + class-blocked backward pair at <=64 classes
    (tools/bench_cb21.py) — must be gradient-exact at VOC-scale class
    counts too (21 -> cb=7, exact divisor)."""
    from pytorch_segmentation_tpu.ops.pallas.softmax_ce import (
        fused_upsample_ce, set_ce_bwd_mode)
    logits = jnp.asarray(rng.standard_normal((2, 8, 8, 21)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 21, (2, 16, 16)).astype(np.int32))
    ref = float(compute_loss(logits, labels, align_corners=True))
    ref_grad = jax.grad(
        lambda l: compute_loss(l, labels, align_corners=True))(logits)
    set_ce_bwd_mode("cb")
    try:
        fused = float(fused_upsample_ce(logits, labels, tile=8,
                                        interpret=True))
        with pltpu.force_tpu_interpret_mode():
            fused_grad = jax.grad(
                lambda l: fused_upsample_ce(l, labels, tile=8,
                                            interpret=True))(logits)
    finally:
        set_ce_bwd_mode("auto")
    assert abs(fused - ref) < 1e-4, (fused, ref)
    np.testing.assert_allclose(np.asarray(fused_grad), np.asarray(ref_grad),
                               rtol=1e-4, atol=1e-6)


def test_fused_ce_extended_classes_padded(rng):
    """67 classes (prime -> class axis padded to 80 for the cb=16 blocked
    backward): gradient parity proves padded-class lanes are discarded."""
    from pytorch_segmentation_tpu.ops.pallas.softmax_ce import (
        fused_upsample_ce)
    logits = jnp.asarray(rng.standard_normal((2, 8, 8, 67)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 67, (2, 16, 16)).astype(np.int32))
    ref = float(compute_loss(logits, labels, align_corners=True))
    fused = float(fused_upsample_ce(logits, labels, tile=8, interpret=True))
    assert abs(fused - ref) < 1e-4, (fused, ref)
    ref_grad = jax.grad(
        lambda l: compute_loss(l, labels, align_corners=True))(logits)
    with pltpu.force_tpu_interpret_mode():
        fused_grad = jax.grad(
            lambda l: fused_upsample_ce(l, labels, tile=8, interpret=True))(
                logits)
    np.testing.assert_allclose(np.asarray(fused_grad), np.asarray(ref_grad),
                               rtol=1e-4, atol=1e-6)
