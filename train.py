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

from pytorch_segmentation_tpu.data import CocoInstance, DataLoader, Fetcher, PostFetch
from pytorch_segmentation_tpu.data.augment import make_augment_fn
from pytorch_segmentation_tpu.engine import Trainer, test
from pytorch_segmentation_tpu.models import build_model
from pytorch_segmentation_tpu.parallel import initialize_distributed, make_mesh
import jax


def train(data_dir, model_name, epochs, img_size, batch_size, accumulate, lr,
          adam, resume, weights, num_workers, multi_scale, rect,
          mixed_precision, notest, nosave, seed=0):
    train_coco = osp.join(data_dir, "train.json")
    val_coco = osp.join(data_dir, "val.json")

    mesh = make_mesh()
    rank = jax.process_index()
    world = jax.process_count()

    train_data = CocoInstance(train_coco, img_size=img_size,
                              multi_scale=multi_scale, rect=rect)
    train_loader = DataLoader(train_data, batch_size=batch_size, shuffle=True,
                              drop_last=True, num_workers=num_workers,
                              seed=seed, rank=rank, world_size=world)
    h, w = img_size[1], img_size[0]
    augment_fn = make_augment_fn()
    train_fetcher = Fetcher(train_loader, PostFetch(
        augment_fn=augment_fn, multi_scale=multi_scale, base_hw=(h, w),
        seed=seed))

    if not notest:
        val_data = CocoInstance(val_coco, img_size=img_size, augments=False,
                                rect=rect)
        val_loader = DataLoader(val_data, batch_size=batch_size,
                                shuffle=False, num_workers=num_workers,
                                rank=rank, world_size=world)
        val_fetcher = Fetcher(val_loader, PostFetch())

    model = build_model(model_name, num_classes=len(train_data.classes),
                        dtype=jnp.bfloat16 if mixed_precision else jnp.float32)

    trainer = Trainer(model, train_fetcher, workdir="weights",
                      accumulate=accumulate, adam=adam, lr=lr,
                      weights=weights, resume=resume,
                      mixed_precision=mixed_precision, mesh=mesh, seed=seed)
    while trainer.epoch < epochs:
        trainer.step()
        best = False
        if not notest:
            metrics = test(trainer.model, val_fetcher, mesh=mesh)
            if metrics > trainer.metrics:
                best = True
                print("save best, miou: %g" % metrics)
                trainer.metrics = metrics
        if not nosave:
            trainer.save(best)
    return trainer


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("data", type=str, default="data/voc")
    parser.add_argument("--model", type=str, default="unet",
                        choices=["unet", "deeplabv3plus", "hrnet"])
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("-s", "--img_size", type=int, nargs=2,
                        default=[320, 320])
    parser.add_argument("-bs", "--batch-size", type=int, default=32)
    parser.add_argument("-a", "--accumulate", type=int, default=2)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--adam", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--weights", type=str, default="")
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--multi-scale", action="store_true")
    parser.add_argument("--rect", action="store_true")
    parser.add_argument("-mp", "--mix_precision", action="store_true",
                        help="bf16 compute (TPU-native AMP)")
    parser.add_argument("--notest", action="store_true")
    parser.add_argument("--nosave", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    opt = parser.parse_args()

    from pytorch_segmentation_tpu.utils.runtime import setup_runtime
    setup_runtime()
    initialize_distributed()
    print(opt)
    train(data_dir=opt.data, model_name=opt.model, epochs=opt.epochs,
          img_size=opt.img_size, batch_size=opt.batch_size,
          accumulate=opt.accumulate, lr=opt.lr, adam=opt.adam,
          resume=opt.resume, weights=opt.weights,
          num_workers=opt.num_workers, multi_scale=opt.multi_scale,
          rect=opt.rect, mixed_precision=opt.mix_precision,
          notest=opt.notest, nosave=opt.nosave, seed=opt.seed)
