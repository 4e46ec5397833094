"""Evaluation engine (TPU-native rebuild of reference test.py:14-73).

Streams batches through a jitted eval step that returns per-class tp/fn/fp
device vectors (no per-class Python loops or `.item()` syncs in the hot loop
— unlike reference test.py:38-46). Accumulation stays on device; under a
data-parallel mesh the confusion sums are global (XLA psum), which is exactly
the reference's `dist.all_reduce(SUM)` on tp/fn/fp (test.py:51-57).
"""

from __future__ import annotations

import jax
import numpy as np
from tqdm import tqdm

from ..ops.metrics import compute_metrics
from ..parallel.mesh import (data_sharding, make_mesh, put_global_batch,
                             replicated_sharding)
from .steps import TrainState, make_eval_step, make_predict_step

__all__ = ["test"]

_EVAL_STEP_CACHE: dict = {}
_EVAL_STEP_CACHE_MAX = 16  # (num_classes, align, sharding) combos are few;
                           # bound it anyway so a class-count sweep in one
                           # process can't grow executables without limit


def test(model, fetcher, show_first_batch: bool = True, log: bool = True,
         mesh=None, int8: bool = False,  # noqa: PT028 — reference API name
         quant_stats=None, tta_flip: bool = False, tta_scales=(),
         report_path: str | None = None, ignore_index: int | None = None,
         tile=None, tile_overlap: float = 1 / 3,
         boundary_ratio: float | None = None):
    """model: engine.trainer.ModelBundle. Returns mean IoU (float).

    Prints the per-class table (or top-5 worst classes when >=10 classes)
    with the reference's format (test.py:59-72). int8=True evaluates the
    int8 PTQ forward (quant.py), reporting the mIoU a quantized serving
    deployment would actually get: dynamic activation scales by default,
    or the calibrated mode (the recommended deployment config) when
    `quant_stats` from quant.calibrate() is passed (test.py
    --calib-batches calibrates on the first batches of the val set).
    tta_flip=True averages logits with a horizontally-flipped second
    forward (test.py --tta; ~2x eval cost). tta_scales adds multi-scale
    TTA (test.py --tta-scales 0.75 1.25; ops/tta.py) — extra forwards at
    /32-snapped scaled sizes, logits resized back and averaged; composes
    with tta_flip.

    report_path writes the FULL per-class table (every class — the printed
    table truncates to the 5 worst at >=10 classes, reference
    test.py:59-72) plus the raw confusion sums as JSON (test.py --report),
    for dashboards/regression tracking.

    tile=(H, W) evaluates in mmseg "slide" mode (test.py --tile W H):
    training-resolution windows over the eval-resolution batch, overlap
    fraction tile_overlap, logits averaged on a canvas — the standard
    protocol when the eval `-s` exceeds the training crop (see
    steps.make_eval_step).

    boundary_ratio (test.py --boundary-iou [R]) additionally accumulates
    per-class Boundary IoU (Cheng et al. 2021, ops/boundary.py; band
    width R of the image diagonal, official default 0.02) — printed as
    a mean and per-class in the --report JSON.
    """
    if quant_stats is not None:
        int8 = True
    from ..ops.tta import normalize_tta_scales
    tta_scales = normalize_tta_scales(tta_scales)
    classes = fetcher.loader.dataset.classes
    num_classes = len(classes)
    # evaluate on low-res logits and resize once in the eval step (identical
    # predictions: the deferred resize is exactly the model's trailing one)
    module = model.module
    align = getattr(module, "up_align_corners", True)
    if getattr(module, "full_res_output", None) is True:
        module = module.clone(full_res_output=False)
    mesh = mesh if mesh is not None else make_mesh()
    # eval outputs must be readable on every host: pin them replicated.
    # The step is cached across calls: test() runs once per epoch, and
    # rebuilding it would re-lower + recompile the whole model every epoch
    # (the model enters via state.apply_fn, a static jit field, so one
    # cached step serves any model; differing models just retrace).
    tile = (int(tile[0]), int(tile[1])) if tile is not None else None
    key = (num_classes, align, replicated_sharding(mesh), int8, tta_flip,
           tta_scales, ignore_index, tile, tile_overlap, boundary_ratio)
    eval_step = _EVAL_STEP_CACHE.get(key)
    if eval_step is None:
        if len(_EVAL_STEP_CACHE) >= _EVAL_STEP_CACHE_MAX:
            _EVAL_STEP_CACHE.pop(next(iter(_EVAL_STEP_CACHE)))
        eval_step = make_eval_step(num_classes, align_corners=align,
                                   out_shardings=replicated_sharding(mesh),
                                   quant=int8, tta_flip=tta_flip,
                                   tta_scales=tta_scales,
                                   ignore_index=ignore_index,
                                   tile=tile, tile_overlap=tile_overlap,
                                   boundary_ratio=boundary_ratio)
        _EVAL_STEP_CACHE[key] = eval_step
    state = TrainState(step=0, params=model.params,
                       batch_stats=model.batch_stats, opt_state=None,
                       tx=None, apply_fn=module.apply)
    sharding = data_sharding(mesh)
    batch_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(mesh.axis_names[0]))
    multihost = jax.process_count() > 1
    # batch sharding into PostFetch: outputs arrive placed (single-host) /
    # globally assembled (multi-host) and put_global_batch passes them
    # through — no per-batch D2H bounce (see engine/trainer.py)
    pf = getattr(fetcher, "post_fetch_fn", None)
    if pf is not None and getattr(pf, "sharding", False) is None:
        pf.sharding = sharding

    tp = np.zeros(num_classes)
    fn = np.zeros(num_classes)
    fp = np.zeros(num_classes)
    b_int = np.zeros(num_classes)
    b_uni = np.zeros(num_classes)
    val_loss = 0.0
    n_batches = 0
    n_read = 0
    pending = None  # device results of the PREVIOUS batch
    pbar = tqdm(fetcher, total=len(fetcher),
                disable=not log or jax.process_index() != 0)

    def drain(res):
        # ONE batched host read (per-array reads pay a ~33 ms tunnel
        # round-trip each) — called one batch late so the read overlaps the
        # CURRENT batch's device compute
        nonlocal val_loss, tp, fn, fp, b_int, b_uni, n_read
        got = jax.device_get(res)
        loss, tp_i, fn_i, fp_i = got[:4]
        val_loss += float(loss)
        tp += tp_i
        fn += fn_i
        fp += fp_i
        if len(got) == 6:
            b_int += got[4]
            b_uni += got[5]
        n_read += 1

    for images, segs, valid in pbar:
        # per-sample mask: multi-host padding is interleaved per process, so
        # the mask shards alongside the batch (steps.sample_valid_mask).
        # `valid` counts THIS process's real samples, so the mask is built
        # at local length — when PostFetch already assembled the global
        # batch (sharding injected above), images.shape[0] is the GLOBAL
        # size and must be divided back down.
        local_b = images.shape[0]
        if multihost and isinstance(images, jax.Array) \
                and not images.is_fully_addressable:
            local_b = images.shape[0] // jax.process_count()
        local_mask = np.arange(local_b) < int(valid)
        images, segs = put_global_batch(sharding, images, segs)
        mask = put_global_batch(batch_sharding, local_mask)
        if quant_stats is not None:
            res = eval_step(state, images, segs, mask, quant_stats)
        else:
            res = eval_step(state, images, segs, mask)
        n_batches += 1
        if n_batches == 1 and show_first_batch and not multihost:
            # predictions only needed for the first-batch visual dump
            # (reference test.py:32-33); computed separately on <=8 samples
            predict = _EVAL_STEP_CACHE.get(("predict", align))
            if predict is None:
                predict = make_predict_step(align_corners=align)
                _EVAL_STEP_CACHE[("predict", align)] = predict
            pred = predict(state, images[:8],
                           (int(segs.shape[1]), int(segs.shape[2])))
            from ..utils.visualize import show_batch
            show_batch(np.asarray(images[:8]), np.asarray(pred))
        if pending is not None:
            drain(pending)
        pending = res
        if n_read:
            T, P, R, miou, F1 = (np.asarray(m) for m in
                                 compute_metrics(tp, fn, fp))
            pbar.set_description(
                "loss: %8g, mAP: %8g, F1: %8g, miou: %8g"
                % (val_loss / n_read, P.mean(), F1.mean(), miou.mean()))
    if pending is not None:
        drain(pending)

    T, P, R, miou, F1 = (np.asarray(m) for m in compute_metrics(tp, fn, fp))
    biou = None
    if boundary_ratio is not None:
        from ..ops.boundary import boundary_iou
        biou = np.asarray(boundary_iou(b_int, b_uni))
    if report_path and jax.process_index() == 0:
        import json
        report = {
            "miou": float(miou.mean()),
            "val_loss": val_loss / max(1, n_read),
            "num_classes": num_classes,
            "per_class": [
                {"name": str(c), "targets": int(T[ci]),
                 "precision": float(P[ci]), "recall": float(R[ci]),
                 "iou": float(miou[ci]), "f1": float(F1[ci]),
                 "tp": float(tp[ci]), "fn": float(fn[ci]),
                 "fp": float(fp[ci]),
                 **({"boundary_iou": float(biou[ci])}
                    if biou is not None else {})}
                for ci, c in enumerate(classes)],
        }
        if biou is not None:
            report["mean_boundary_iou"] = float(biou.mean())
            report["boundary_ratio"] = boundary_ratio
        with open(report_path, "w") as f:
            json.dump(report, f, indent=1)
    if log and jax.process_index() == 0:
        if num_classes < 10:
            for ci, c in enumerate(classes):
                print("cls: %8s, targets: %8d, pre: %8g, rec: %8g, "
                      "iou: %8g, F1: %8g"
                      % (c, T[ci], P[ci], R[ci], miou[ci], F1[ci]))
        else:
            print("top error 5")
            order = np.argsort(miou)[:5]
            for ci in order:
                print("cls: %8s, targets: %8d, pre: %8g, rec: %8g, "
                      "iou: %8g, F1: %8g"
                      % (classes[ci], T[ci], P[ci], R[ci], miou[ci], F1[ci]))
        if biou is not None:
            print("mean boundary iou (band %g of diagonal): %8g"
                  % (boundary_ratio, biou.mean()))
    return float(miou.mean())


# keep pytest from collecting the reference-named `test` entry point
test.__test__ = False
