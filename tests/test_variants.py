"""--variant CLI plumbing (models.variant_kwargs): size-variant selection
for the families that have one (the reference has no model-size axis;
SegFormer B0..B5 / FPN R50/R34 are framework additions)."""

import pytest

from pytorch_segmentation_tpu.models import (MODEL_VARIANTS, build_model,
                                             variant_kwargs)


def test_variant_kwargs_tables():
    assert variant_kwargs("segformer", "") == {}
    assert variant_kwargs("unet", "") == {}  # '' is always valid
    assert variant_kwargs("segformer", "b3") == {"variant": "b3"}
    assert variant_kwargs("fpn", "r50") == {}
    assert variant_kwargs("fpn", "r34") == {
        "block": "basic", "backbone_layers": (3, 4, 6, 3)}
    with pytest.raises(ValueError, match="no variants"):
        variant_kwargs("unet", "b1")
    with pytest.raises(ValueError, match="unknown segformer variant"):
        variant_kwargs("segformer", "b9")
    # every table entry must build (ctor-level; no init/compile)
    for name, table in MODEL_VARIANTS.items():
        for v in table:
            build_model(name, num_classes=2, **variant_kwargs(name, v))


def test_variant_kwargs_construct_the_right_model():
    m = build_model("segformer", num_classes=2,
                    **variant_kwargs("segformer", "b1"))
    assert m.variant == "b1"
    m = build_model("fpn", num_classes=2, **variant_kwargs("fpn", "r34"))
    assert m.block == "basic" and m.backbone_layers == (3, 4, 6, 3)
