"""Evaluation reporting: per-class vs top-5-worst table selection
(reference test.py:59-72) and loader length semantics."""

import os.path as osp

import jax.numpy as jnp
import numpy as np

from pytorch_segmentation_tpu.data import CocoDataset, DataLoader, Fetcher, PostFetch
from pytorch_segmentation_tpu.engine import ModelBundle, test
from pytorch_segmentation_tpu.models import UNet


def test_loader_len(synthetic_coco):
    ds = CocoDataset(osp.join(synthetic_coco, "val.json"), img_size=(32, 32),
                     augments=False)  # 8 samples
    assert len(DataLoader(ds, batch_size=3)) == 3            # ceil(8/3)
    assert len(DataLoader(ds, batch_size=3, drop_last=True)) == 2
    assert len(DataLoader(ds, batch_size=8)) == 1
    # world sharding: each rank sees ceil(8/2)=4 -> 2 batches of 2
    assert len(DataLoader(ds, batch_size=2, rank=0, world_size=2)) == 2


def test_top5_table_many_classes(synthetic_coco, capsys):
    """>=10 classes triggers the top-error-5 report path."""
    ds = CocoDataset(osp.join(synthetic_coco, "val.json"), img_size=(32, 32),
                     augments=False)
    ds.classes = [f"c{i}" for i in range(12)]  # force many-classes path
    fetcher = Fetcher(DataLoader(ds, batch_size=8, num_workers=1),
                      PostFetch())
    import jax
    model = UNet(num_classes=12, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    bundle = ModelBundle(model, variables["params"],
                         variables["batch_stats"])
    miou = test(bundle, fetcher, show_first_batch=False, log=True)
    out = capsys.readouterr().out
    assert "top error 5" in out
    assert out.count("cls:") == 5
    assert 0.0 <= miou <= 1.0


def test_report_json(synthetic_coco, tmp_path):
    """--report writes the FULL per-class table (all classes even when the
    printed table truncates to worst-5) + raw confusion sums; miou in the
    file equals the returned value."""
    import json

    import jax

    ds = CocoDataset(osp.join(synthetic_coco, "val.json"), img_size=(32, 32),
                     augments=False)
    ds.classes = [f"c{i}" for i in range(12)]  # >=10: printed table truncates
    fetcher = Fetcher(DataLoader(ds, batch_size=8, num_workers=1),
                      PostFetch())
    model = UNet(num_classes=12, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    bundle = ModelBundle(model, variables["params"],
                         variables["batch_stats"])
    path = str(tmp_path / "report.json")
    miou = test(bundle, fetcher, show_first_batch=False, log=False,
                report_path=path)
    rep = json.load(open(path))
    assert rep["num_classes"] == 12
    assert len(rep["per_class"]) == 12  # full table, not worst-5
    assert abs(rep["miou"] - miou) < 1e-9
    assert rep["per_class"][0]["name"] == "c0"
    for row in rep["per_class"]:
        # tp+fn == targets (pixel count of that class in the val set)
        assert row["targets"] == int(row["tp"] + row["fn"])
        assert 0.0 <= row["iou"] <= 1.0
