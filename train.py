#!/usr/bin/env python3
"""Training CLI (TPU-native rebuild of reference train.py).

Flag surface preserved from the reference (train.py:85-110), plus `--model`
to select the architecture from the CLI (fixing the reference's hard-coded
comment-toggle at train.py:57-59) and `--sync-bn`/`--backend` adapted to the
JAX runtime. Distributed: no external launcher — one process per host,
`jax.distributed.initialize` when a coordinator is configured; the device
mesh covers all chips (SURVEY.md §2.4).
"""

import argparse
import os.path as osp

import jax.numpy as jnp

from pytorch_segmentation_tpu.data import (CocoDataset, CocoInstance,
                                           DataLoader, Fetcher,
                                           IdImgDataset, PostFetch,
                                           SegImgDataset)
from pytorch_segmentation_tpu.data.augment import make_augment_fn
from pytorch_segmentation_tpu.engine import Trainer, test
from pytorch_segmentation_tpu.models import (MODEL_REGISTRY,
                                              build_model)
from pytorch_segmentation_tpu.parallel import initialize_distributed, make_mesh
import jax


DATASETS = {
    # reference train.py:25 uses CocoInstance; 'coco' gives dense semantic
    # masks; 'segimg' consumes the voc2dataset.py layout (train.txt/val.txt
    # + images/ + labels/ + classes.names) the reference never wired up
    "cocoinstance": (CocoInstance, "train.json", "val.json"),
    "coco": (CocoDataset, "train.json", "val.json"),
    "segimg": (SegImgDataset, "train.txt", "val.txt"),
    # grayscale class-id label PNGs (Cityscapes labelIds / ADE20K
    # convention); pair with --ignore-index 255 when the labels use it
    "idimg": (IdImgDataset, "train.txt", "val.txt"),
}


def parse_class_weights(spec: str, num_classes: int):
    """--class-weights: 'w1,w2,...' (C floats) or a JSON file containing a
    list (or {'weights': [...]}). Returns a float list of length C or
    None."""
    if not spec:
        return None
    if osp.exists(spec):
        import json
        with open(spec) as f:
            data = json.load(f)
        if isinstance(data, dict):
            data = data["weights"]
        weights = [float(v) for v in data]
    else:
        weights = [float(v) for v in spec.split(",")]
    if len(weights) != num_classes:
        raise SystemExit(f"--class-weights has {len(weights)} entries, "
                         f"dataset has {num_classes} classes")
    return weights


def train(data_dir, model_name, epochs, img_size, batch_size, accumulate, lr,
          adam, resume, weights, num_workers, multi_scale, rect,
          mixed_precision, notest, nosave, seed=0, profile=False,
          dataset="cocoinstance", remat=False, lr_schedule="constant",
          warmup_steps=0, fast_augment=False, precompile=False, qat=False,
          ema=0.0, loss="ce", cache_images=False, momentum=0.9,
          weight_decay=0.0, clip_grad=0.0, patience=0, aux_loss=0.0, tp=1,
          variant="", pp=1, pp_microbatches=0, scan_blocks=False,
          distill="", distill_model="", distill_variant="",
          distill_weight=1.0, distill_temp=2.0, class_weights="",
          label_smoothing=0.0, ohem=0.0, ohem_thresh=0.7, zero=False,
          moe=0, moe_top_k=2, ep=1, spatial=1, ignore_index=None,
          cutmix=0.0, mosaic=0.0, balance=0.0,
          matcher="sinkhorn"):
    ds_cls, train_file, val_file = DATASETS[dataset]
    train_coco = osp.join(data_dir, train_file)
    val_coco = osp.join(data_dir, val_file)

    if sum(d > 1 for d in (tp, pp, ep, spatial)) > 1:
        raise SystemExit("--tp/--pp/--ep/--spatial are separate inner mesh "
                         "axes; combine any ONE with data parallelism, not "
                         "with each other")
    if ep > 1 and not moe:
        raise SystemExit("--ep shards MoE expert stacks; it needs --moe E")
    if moe and (scan_blocks or pp > 1):
        raise SystemExit("--moe needs unrolled blocks (the sown aux loss "
                         "and per-block expert trees don't cross the "
                         "lax.scan boundary) — drop --scan-blocks/--pp")
    if tp > 1:
        # (data, model) mesh: Megatron-style tensor parallelism for the
        # transformer family (parallel/tp.py) x data parallelism — a scaling
        # axis beyond the reference's DDP-only strategy
        from pytorch_segmentation_tpu.parallel import make_tp_mesh
        mesh = make_tp_mesh(tp)
    elif pp > 1:
        # (data, pipe) mesh: GPipe pipeline parallelism over the deep
        # transformer block stacks (parallel/pp.py)
        from pytorch_segmentation_tpu.parallel import make_pp_mesh
        mesh = make_pp_mesh(pp)
    elif ep > 1:
        # (data, expert) mesh: expert parallelism for --moe (parallel/ep.py)
        from pytorch_segmentation_tpu.parallel import make_ep_mesh
        mesh = make_ep_mesh(ep)
    elif spatial > 1:
        # (data, space) mesh: activations shard over image H and XLA
        # inserts the conv halo exchanges (docs/SCALING.md) — for images
        # too large for one chip's HBM
        mesh = make_mesh(spatial=spatial)
    else:
        mesh = make_mesh()
    rank = jax.process_index()
    world = jax.process_count()

    train_data = ds_cls(train_coco, img_size=img_size,
                        multi_scale=multi_scale, rect=rect,
                        cache_images=cache_images)
    rf = None
    if balance > 0:
        # LVIS repeat-factor oversampling of rare-class images
        # (data/loader.repeat_factors; typical t = 0.001)
        presence = train_data.class_presence()
        if presence is None:
            raise SystemExit(f"--balance: dataset {dataset!r} cannot "
                             "report per-image class presence")
        from pytorch_segmentation_tpu.data.loader import repeat_factors
        rf = repeat_factors(presence, len(train_data), balance)
        print(f"balance: t={balance}, mean repeat {rf.mean():.3f}, "
              f"max {rf.max():.2f} "
              f"({int((rf > 1).sum())}/{len(rf)} images oversampled)")
    train_loader = DataLoader(train_data, batch_size=batch_size, shuffle=True,
                              drop_last=True, num_workers=num_workers,
                              seed=seed, rank=rank, world_size=world,
                              repeat_factors=rf)
    h, w = img_size[1], img_size[0]
    from pytorch_segmentation_tpu.data.augment import AugmentConfig
    augment_fn = make_augment_fn(
        AugmentConfig(fast_geometric=True) if fast_augment else None)
    from pytorch_segmentation_tpu.data.mix import make_mix_fn
    # bf16 feed when the model computes bf16: its first conv casts the
    # input anyway, so this is bit-identical downstream and halves the
    # prep-out/step-in HBM traffic (PERF.md round 5)
    feed_dtype = jnp.bfloat16 if mixed_precision else jnp.float32
    train_fetcher = Fetcher(train_loader, PostFetch(
        augment_fn=augment_fn, multi_scale=multi_scale, base_hw=(h, w),
        seed=seed, dtype=feed_dtype,
        mix_fn=make_mix_fn(cutmix_p=cutmix, mosaic_p=mosaic)))

    if not notest:
        val_data = ds_cls(val_coco, img_size=img_size, augments=False,
                          rect=rect, cache_images=cache_images)
        val_loader = DataLoader(val_data, batch_size=batch_size,
                                shuffle=False, num_workers=num_workers,
                                rank=rank, world_size=world)
        val_fetcher = Fetcher(val_loader, PostFetch())

    from pytorch_segmentation_tpu.models import variant_kwargs
    model_kw = variant_kwargs(model_name, variant)
    if remat and model_name in ("deeplabv3plus", "pspnet", "fpn",
                                "fastfcn", "segformer", "bisenetv2",
                                "fcn", "deeplabv3", "segnext",
                                "segmenter", "upernet", "danet"):
        model_kw["remat"] = True
    elif remat:
        raise SystemExit(f"--remat is not supported for {model_name} "
                         "(no remat-capable block stages)")
    if aux_loss > 0 and model_name == "upernet":
        model_kw["aux"] = True  # FCN aux on C4 (models/upernet.py)
    elif aux_loss > 0:
        if model_name not in ("pspnet", "fastfcn", "bisenetv2", "ocrnet",
                              "fcn", "deeplabv3", "danet"):
            raise SystemExit("--aux-loss is only supported by the "
                             "pspnet/fastfcn/upernet/bisenetv2/ocrnet/"
                             "fcn/deeplabv3/danet families")
        model_kw["aux"] = True  # bisenetv2 booster / danet branch heads
    if scan_blocks or pp > 1:
        from pytorch_segmentation_tpu.models import apply_scan_blocks
        apply_scan_blocks(model_name, model_kw, True)
    if moe:
        from pytorch_segmentation_tpu.models import apply_moe
        apply_moe(model_name, model_kw, moe, moe_top_k)
    if pp > 1:
        model_kw["pp_mesh"] = mesh
        if pp_microbatches:
            model_kw["pp_microbatches"] = pp_microbatches
    if patience and notest:
        raise SystemExit("--patience keys off per-epoch val mIoU; it can't "
                         "work with --notest")
    model = build_model(model_name, num_classes=len(train_data.classes),
                        dtype=jnp.bfloat16 if mixed_precision else jnp.float32,
                        **model_kw)

    distill_fn = None
    if distill:
        # knowledge distillation (engine/steps.distill_loss): a frozen
        # teacher (any zoo family/variant, e.g. a trained segformer-b5)
        # runs eval-mode inside the student's train step; the student
        # adds distill_weight * T^2 * KL(teacher || student) to its loss
        from pytorch_segmentation_tpu.engine.checkpoint import \
            load_model_bundle
        tname = distill_model or model_name
        teacher = build_model(
            tname, num_classes=len(train_data.classes),
            dtype=jnp.bfloat16 if mixed_precision else jnp.float32,
            full_res_output=False,
            **variant_kwargs(tname, distill_variant))
        tbundle = load_model_bundle(teacher, distill, (h, w))

        def distill_fn(imgs):
            return teacher.apply(
                {"params": tbundle.params,
                 "batch_stats": tbundle.batch_stats}, imgs, train=False)

    from pytorch_segmentation_tpu.ops.loss import build_loss
    cw = parse_class_weights(class_weights, len(train_data.classes))
    if model_name == "maskformer":
        # mask classification trains on the set-prediction criterion
        # (matching + cls CE + focal + dice), not per-pixel CE
        from pytorch_segmentation_tpu.models import make_maskformer_loss
        if loss != "ce":
            raise SystemExit("--loss is fixed to the set-prediction "
                             "criterion for --model maskformer")
        loss_fn = make_maskformer_loss(len(train_data.classes),
                                       matcher=matcher)
    else:
        loss_fn = build_loss(loss, align_corners=getattr(
            model, "up_align_corners", True), class_weights=cw,
            label_smoothing=label_smoothing, ohem_frac=ohem,
            ohem_thresh=ohem_thresh, ignore_index=ignore_index)
    trainer = Trainer(model, train_fetcher, loss_fn=loss_fn, zero=zero,
                      distill_fn=distill_fn, distill_weight=distill_weight,
                      distill_temp=distill_temp,
                      workdir="weights",
                      accumulate=accumulate, adam=adam, lr=lr,
                      weights=weights, resume=resume,
                      mixed_precision=mixed_precision, mesh=mesh, seed=seed,
                      momentum=momentum, weight_decay=weight_decay,
                      clip_grad=clip_grad,
                      profile=profile,
                      # deferred upsample composes with multi-scale: the
                      # reference resizes only the *images* post-normalize
                      # (utils/datasets.py:206-212) — labels stay at base
                      # resolution, so the loss pairing (low-res logits vs
                      # label-res targets) is unchanged per logits size
                      defer_upsample=True,
                      lr_schedule=lr_schedule, warmup_steps=warmup_steps,
                      # optimizer updates: one per `accumulate` loader
                      # batches (reference every-k-batches accumulation)
                      total_steps=epochs * len(train_loader)
                      // max(1, accumulate),
                      qat=qat, ema_decay=ema, aux_weight=aux_loss)
    if precompile:
        # warm-up precompilation of the bounded multi-scale size set (or the
        # single base size) — no first-epoch compile stalls
        from pytorch_segmentation_tpu.data.resize_host import multi_scale_sizes
        sizes = (multi_scale_sizes((h, w)) if multi_scale else [(h, w)])
        trainer.warmup(sizes, batch_size)
    epochs_since_best = 0
    while trainer.epoch < epochs:
        trainer.step()
        best = False
        if not notest:
            # under QAT the deployment target is the int8 forward, so track
            # (and select "best" on) the quantized mIoU; under --ema the
            # deployment weights are the averaged ones, so eval those
            eval_model = trainer.ema_model if ema > 0 else trainer.model
            metrics = test(eval_model, val_fetcher, mesh=mesh, int8=qat,
                           ignore_index=ignore_index)
            trainer.log_record(epoch=trainer.epoch - 1, val_miou=metrics)
            if metrics > trainer.metrics:
                best = True
                print("save best, miou: %g" % metrics)
                trainer.metrics = metrics
                epochs_since_best = 0
            else:
                epochs_since_best += 1
        if not nosave:
            trainer.save(best)
        if patience and epochs_since_best >= patience:
            print("early stop: no val mIoU improvement in %d epochs "
                  "(best %g)" % (patience, trainer.metrics))
            break
    return trainer


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("data", type=str, default="data/voc")
    parser.add_argument("--model", type=str, default="unet",
                        choices=sorted(MODEL_REGISTRY))
    parser.add_argument("--dataset", type=str, default="cocoinstance",
                        choices=sorted(DATASETS))
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("-s", "--img_size", type=int, nargs=2,
                        default=[320, 320])
    parser.add_argument("-bs", "--batch-size", type=int, default=32)
    parser.add_argument("-a", "--accumulate", type=int, default=2)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--adam", action="store_true")
    parser.add_argument("--momentum", type=float, default=0.9,
                        help="SGD momentum (ignored with --adam)")
    parser.add_argument("--weight-decay", type=float, default=0.0,
                        help="L2 weight decay added to the gradients before "
                             "the optimizer (torch SGD/Adam weight_decay "
                             "semantics — coupled, runs through the "
                             "momentum/adaptive terms)")
    parser.add_argument("--clip-grad", type=float, default=0.0,
                        metavar="NORM",
                        help="clip the raw gradients' global L2 norm "
                             "(torch clip_grad_norm_ semantics); 0 = off")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--weights", type=str, default="")
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--multi-scale", action="store_true")
    parser.add_argument("--rect", action="store_true")
    parser.add_argument("-mp", "--mix_precision", action="store_true",
                        help="bf16 compute (TPU-native AMP)")
    parser.add_argument("--notest", action="store_true")
    parser.add_argument("--nosave", action="store_true")
    parser.add_argument("--aux-loss", type=float, default=0.0, metavar="W",
                        help="pspnet/fastfcn/upernet/bisenetv2/ocrnet: add "
                             "the canonical "
                             "auxiliary FCN head (layer3 / C4; ocrnet: "
                             "supervise its soft-region logits, the "
                             "paper's cascade) and weight its loss by W "
                             "during training (same criterion as --loss; "
                             "with the default ce, W=0.4 is the "
                             "hszhao/semseg convention; 0 = off). "
                             "Train-time only — eval/serving/export see "
                             "the single-output graph")
    parser.add_argument("--patience", type=int, default=0, metavar="N",
                        help="early stopping: end training when val mIoU "
                             "has not improved for N consecutive epochs "
                             "(0 = off; requires per-epoch val — rejected "
                             "with --notest; the no-improvement counter "
                             "restarts from 0 on --resume)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile", action="store_true",
                        help="jax.profiler trace of first-epoch steps "
                             "-> runs/profile")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize backbone activations — only "
                             "for configs whose activations exceed HBM "
                             "(b4/b5-scale, very large inputs); measured "
                             "6-13%% pure overhead where the batch "
                             "already fits (PERF.md)")
    parser.add_argument("--lr-schedule", type=str, default="constant",
                        choices=["constant", "cosine", "poly"],
                        help="'poly' = (1-step/total)^0.9, the standard "
                             "DeepLab segmentation schedule")
    parser.add_argument("--warmup-steps", type=int, default=0)
    parser.add_argument("--bn-subsample", type=int, default=1,
                        help="compute BN statistics from every s-th pixel "
                             "(1 = exact; 2 cuts BN reduce bandwidth 4x)")
    parser.add_argument("--fast-augment", action="store_true",
                        help="MXU-only geometric augmentation (90-deg "
                             "rotation snap, no shear/perspective/elastic) "
                             "— ~10x faster on TPU, see PERF.md")
    parser.add_argument("--cutmix", type=float, default=0.0, metavar="P",
                        help="per-sample CutMix probability: paste a "
                             "random box (and its labels) from the next "
                             "batch sample; on-device, before the augment "
                             "policy (data/mix.py)")
    parser.add_argument("--mosaic", type=float, default=0.0, metavar="P",
                        help="per-sample 4-image mosaic-stitch probability "
                             "(same-scale quadrants around a random "
                             "center; data/mix.py)")
    parser.add_argument("--balance", type=float, default=0.0, metavar="T",
                        help="repeat-factor oversampling of rare-class "
                             "images (LVIS-style): images whose rarest "
                             "class appears in < T of images repeat "
                             "~sqrt(T/freq) times per epoch (try 1e-3)")
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (sanitizer)")
    parser.add_argument("--precompile", action="store_true",
                        help="compile the train step for every multi-scale "
                             "size up front (no first-epoch stalls)")
    parser.add_argument("--qat", action="store_true",
                        help="quantization-aware training: fake-quant every "
                             "int8-eligible conv (STE) so int8 PTQ serving "
                             "costs ~zero accuracy; epoch-end val runs the "
                             "int8 forward (docs/QUANTIZATION.md)")
    parser.add_argument("--cache-images", action="store_true",
                        help="keep host records in RAM after epoch 1 "
                             "(decode/rasterize/resize once; ~1 MB per "
                             "513^2 sample — see data/datasets.py)")
    from pytorch_segmentation_tpu.ops.loss import LOSSES
    parser.add_argument("--matcher", type=str, default="sinkhorn",
                        choices=["sinkhorn", "hungarian"],
                        help="maskformer query<->class matcher: 'sinkhorn' "
                             "runs on device (entropy-regularized OT, "
                             "jittable); 'hungarian' is exact via a host "
                             "scipy callback (one host sync per step)")
    parser.add_argument("--loss", type=str, default="ce",
                        choices=list(LOSSES),
                        help="training loss: 'ce' = the reference's "
                             "upsample+CE (fused Pallas path); 'ce+rect' = "
                             "the reference's commented-out RectLoss hook; "
                             "lovasz/focal/dice per ops/loss.py")
    parser.add_argument("--class-weights", type=str, default="",
                        metavar="W1,W2,.. | FILE.json",
                        help="per-class CE weights (torch "
                             "CrossEntropyLoss(weight=) semantics): a "
                             "comma list of C floats, or a JSON file with "
                             "a list / {'weights': [...]} (ops/loss."
                             "weighted_cross_entropy)")
    parser.add_argument("--label-smoothing", type=float, default=0.0,
                        metavar="EPS",
                        help="CE label smoothing (torch semantics: target "
                             "= (1-EPS)*onehot + EPS/C)")
    parser.add_argument("--ohem", type=float, default=0.0, metavar="FRAC",
                        help="online hard example mining on the CE term: "
                             "keep pixels with true-class prob < "
                             "--ohem-thresh, always at least FRAC of all "
                             "pixels (the hardest; mmseg OhemPixelSampler "
                             "semantics, static-shape top_k)")
    parser.add_argument("--ohem-thresh", type=float, default=0.7,
                        help="OHEM probability threshold (with --ohem)")
    parser.add_argument("--moe", type=int, default=0, metavar="E",
                        help="mixture-of-experts: swap alternate stage-3/4 "
                             "FFNs of the MiT encoder for routed E-expert "
                             "MLPs (nn/moe.py: top-k routing, Switch "
                             "load-balance aux loss; segformer only). "
                             "Eval CLIs must pass the same --moe")
    parser.add_argument("--moe-top-k", type=int, default=2, metavar="K",
                        help="experts per token (1 = Switch, 2 = GShard/"
                             "V-MoE default)")
    parser.add_argument("--ep", type=int, default=1, metavar="N",
                        help="expert-parallel degree: shard the --moe "
                             "expert stacks over an inner 'expert' mesh "
                             "axis (parallel/ep.py), batch over 'data'; "
                             "devices must be divisible by N")
    parser.add_argument("--ignore-index", type=int, default=None,
                        metavar="ID",
                        help="label id excluded from the loss AND the "
                             "eval confusion counts (torch cross_entropy("
                             "ignore_index=) semantics; e.g. 255 for "
                             "Cityscapes/ADE20K-style --dataset idimg "
                             "labels). Composes with the CE term of any "
                             "--loss ce/ce+*; runs the full-res XLA loss "
                             "path (the fused Pallas CE implements the "
                             "reference's all-pixel contract)")
    parser.add_argument("--spatial", type=int, default=1, metavar="N",
                        help="spatial sharding: 2-D (data, space) mesh — "
                             "activations shard over image H, XLA inserts "
                             "the conv halo exchanges (for images too "
                             "large for one chip; docs/SCALING.md); "
                             "devices must be divisible by N")
    parser.add_argument("--zero", action="store_true",
                        help="ZeRO-1 optimizer-state sharding: shard the "
                             "optimizer trace / grad accumulator / EMA "
                             "over the 'data' mesh axis (weight-update "
                             "sharding — grads reduce-scatter, updated "
                             "params all-gather; parallel/zero.py)")
    parser.add_argument("--variant", type=str, default="",
                        help="model size variant (segformer: b0..b5; fpn: "
                             "r50/r34); empty = the family default")
    parser.add_argument("--tp", type=int, default=1, metavar="N",
                        help="tensor-parallel degree: shard the transformer "
                             "family's attention/FFN weights over an inner "
                             "'model' mesh axis (Megatron-style, "
                             "parallel/tp.py), batch over the outer 'data' "
                             "axis; devices must be divisible by N")
    parser.add_argument("--pp", type=int, default=1, metavar="N",
                        help="pipeline-parallel degree: shard the deep "
                             "transformer block stacks layer-wise over an "
                             "inner 'pipe' mesh axis and stream "
                             "microbatches through the GPipe schedule "
                             "(parallel/pp.py); the stage depth must be "
                             "divisible by N (segformer b3/b5 stage 3: "
                             "18/40 layers); implies --scan-blocks")
    parser.add_argument("--pp-microbatches", type=int, default=0,
                        metavar="M",
                        help="GPipe microbatches per step (0 = 2*pp); the "
                             "per-data-shard batch must be divisible by M")
    parser.add_argument("--scan-blocks", action="store_true",
                        help="stack each transformer stage's blocks along "
                             "a leading layer axis and apply them with "
                             "lax.scan: one compiled block body instead of "
                             "depth unrolled copies. NOTE: costs ~1.55x "
                             "step time on-chip (XLA can't fuse across the "
                             "scan boundary — PERF.md); use as the --pp "
                             "prerequisite or when a b4/b5-scale program "
                             "blows compile budgets (b5 HLO is 6.2x "
                             "smaller). Checkpoints convert with "
                             "tools/convert_ckpt_layout.py")
    parser.add_argument("--distill", type=str, default="", metavar="CKPT",
                        help="knowledge distillation: framework checkpoint "
                             "of a frozen teacher; adds T^2-scaled "
                             "KL(teacher||student) to the training loss "
                             "(runs inside the same jitted train step)")
    parser.add_argument("--distill-model", type=str, default="",
                        help="teacher family (default: same as --model)")
    parser.add_argument("--distill-variant", type=str, default="",
                        help="teacher size variant (e.g. b5 for a "
                             "segformer teacher)")
    parser.add_argument("--distill-weight", type=float, default=1.0,
                        metavar="W", help="weight of the KD term")
    parser.add_argument("--distill-temp", type=float, default=2.0,
                        metavar="T", help="softmax temperature (Hinton "
                             "convention; loss scales by T^2)")
    parser.add_argument("--ema", type=float, default=0.0, metavar="DECAY",
                        help="keep an exponential moving average of the "
                             "weights (e.g. 0.999); epoch-end val and "
                             "'best' selection use the averaged weights, "
                             "checkpoints store them under the 'ema' key "
                             "(test.py/inference.py --ema)")
    opt = parser.parse_args()

    from pytorch_segmentation_tpu.utils.runtime import setup_runtime
    setup_runtime(debug_nans=opt.debug_nans)
    if opt.bn_subsample > 1:
        from pytorch_segmentation_tpu.nn.blocks import set_bn_stat_subsample
        set_bn_stat_subsample(opt.bn_subsample)
    initialize_distributed()
    print(opt)
    train(data_dir=opt.data, model_name=opt.model, epochs=opt.epochs,
          img_size=opt.img_size, batch_size=opt.batch_size,
          accumulate=opt.accumulate, lr=opt.lr, adam=opt.adam,
          resume=opt.resume, weights=opt.weights,
          num_workers=opt.num_workers, multi_scale=opt.multi_scale,
          rect=opt.rect, mixed_precision=opt.mix_precision,
          notest=opt.notest, nosave=opt.nosave, seed=opt.seed,
          profile=opt.profile, dataset=opt.dataset, remat=opt.remat,
          lr_schedule=opt.lr_schedule, warmup_steps=opt.warmup_steps,
          fast_augment=opt.fast_augment, precompile=opt.precompile,
          qat=opt.qat, ema=opt.ema, loss=opt.loss,
          cache_images=opt.cache_images, momentum=opt.momentum,
          weight_decay=opt.weight_decay, clip_grad=opt.clip_grad,
          patience=opt.patience, aux_loss=opt.aux_loss, tp=opt.tp,
          matcher=opt.matcher,
          variant=opt.variant, pp=opt.pp,
          pp_microbatches=opt.pp_microbatches,
          scan_blocks=opt.scan_blocks, distill=opt.distill,
          distill_model=opt.distill_model,
          distill_variant=opt.distill_variant,
          distill_weight=opt.distill_weight,
          distill_temp=opt.distill_temp, class_weights=opt.class_weights,
          label_smoothing=opt.label_smoothing, ohem=opt.ohem,
          ohem_thresh=opt.ohem_thresh, zero=opt.zero, moe=opt.moe,
          moe_top_k=opt.moe_top_k, ep=opt.ep, spatial=opt.spatial,
          ignore_index=opt.ignore_index, cutmix=opt.cutmix,
          mosaic=opt.mosaic, balance=opt.balance)
