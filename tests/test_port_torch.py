"""Weight-porting: synthetic torchvision-layout state_dicts map exactly onto
our backbone trees (every converted tensor lands with matching shape, and the
model forward runs with the merged weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_segmentation_tpu.models import DeepLabV3Plus, UNet
from pytorch_segmentation_tpu.utils.port_torch import load_pretrained_backbone

_MBV2_CFG = [  # (t, c, n, s) standard MobileNetV2
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


def _synthetic_mbv2_sd(rng):
    """Random state_dict with torchvision mobilenet_v2 keys/shapes (OIHW).
    Values kept small so a 50-layer forward stays finite."""
    sd = {}

    def conv(key, o, i, k):
        sd[key] = (rng.standard_normal((o, i, k, k)) * 0.05).astype(np.float32)

    def bn(prefix, c):
        sd[prefix + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[prefix + ".bias"] = (rng.standard_normal(c) * 0.05).astype(np.float32)
        sd[prefix + ".running_mean"] = (rng.standard_normal(c) * 0.05
                                        ).astype(np.float32)
        sd[prefix + ".running_var"] = rng.uniform(0.8, 1.2, c).astype(np.float32)

    conv("features.0.0.weight", 32, 3, 3)
    bn("features.0.1", 32)
    in_c, feat = 32, 1
    for t, c, n, s in _MBV2_CFG:
        for b in range(n):
            base = f"features.{feat}.conv"
            hidden = in_c * t
            if t == 1:
                sd[base + ".0.0.weight"] = (rng.standard_normal(
                    (hidden, 1, 3, 3)) * 0.05).astype(np.float32)
                bn(base + ".0.1", hidden)
                conv(base + ".1.weight", c, hidden, 1)
                bn(base + ".2", c)
            else:
                conv(base + ".0.0.weight", hidden, in_c, 1)
                bn(base + ".0.1", hidden)
                sd[base + ".1.0.weight"] = (rng.standard_normal(
                    (hidden, 1, 3, 3)) * 0.05).astype(np.float32)
                bn(base + ".1.1", hidden)
                conv(base + ".2.weight", c, hidden, 1)
                bn(base + ".3", c)
            in_c = c
            feat += 1
    conv("features.18.0.weight", 1280, 320, 1)
    bn("features.18.1", 1280)
    return sd


def _synthetic_resnet50_sd(rng):
    sd = {}

    def conv(key, o, i, k):
        sd[key] = (rng.standard_normal((o, i, k, k)) * 0.05).astype(np.float32)

    def bn(prefix, c):
        sd[prefix + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[prefix + ".bias"] = (rng.standard_normal(c) * 0.05).astype(np.float32)
        sd[prefix + ".running_mean"] = (rng.standard_normal(c) * 0.05
                                        ).astype(np.float32)
        sd[prefix + ".running_var"] = rng.uniform(0.8, 1.2, c).astype(np.float32)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    in_c = 64
    for li, (n_blocks, width) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512))):
        for b in range(n_blocks):
            base = f"layer{li + 1}.{b}"
            conv(base + ".conv1.weight", width, in_c, 1)
            bn(base + ".bn1", width)
            conv(base + ".conv2.weight", width, width, 3)
            bn(base + ".bn2", width)
            conv(base + ".conv3.weight", width * 4, width, 1)
            bn(base + ".bn3", width * 4)
            if b == 0:
                conv(base + ".downsample.0.weight", width * 4, in_c, 1)
                bn(base + ".downsample.1", width * 4)
            in_c = width * 4
    return sd


@pytest.mark.parametrize("arch,model_cls", [
    ("mobilenetv2", UNet), ("resnet50", DeepLabV3Plus)])
def test_port_roundtrip(arch, model_cls, rng):
    model = model_cls(num_classes=2, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    sd = (_synthetic_mbv2_sd(rng) if arch == "mobilenetv2"
          else _synthetic_resnet50_sd(rng))
    params, stats = load_pretrained_backbone(
        variables["params"], variables["batch_stats"], sd, arch)
    # a known tensor landed (stem conv transposed OIHW->HWIO)
    ref = sd["features.0.0.weight" if arch == "mobilenetv2"
             else "conv1.weight"]
    got = params["backbone"]["stem"]["conv"]["kernel"]
    np.testing.assert_allclose(got, np.transpose(ref, (2, 3, 1, 0)))
    # forward runs with merged weights
    y = model.apply({"params": params, "batch_stats": stats},
                    jnp.zeros((1, 64, 64, 3)), train=False)
    assert y.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(y)).all()


def test_port_shape_mismatch_rejected(rng):
    model = UNet(num_classes=2, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    sd = _synthetic_mbv2_sd(rng)
    sd["features.0.0.weight"] = np.zeros((31, 3, 3, 3), np.float32)
    with pytest.raises(ValueError, match="shape"):
        load_pretrained_backbone(variables["params"],
                                 variables["batch_stats"], sd, "mobilenetv2")


def test_port_weights_cli_roundtrip(rng, tmp_path):
    """port_weights.py: torchvision .pth -> framework checkpoint consumable
    by the Trainer --weights path (engine.checkpoint.restore_into)."""
    import torch

    import port_weights
    from pytorch_segmentation_tpu.engine.checkpoint import (load_checkpoint,
                                                            restore_into)
    from torch_refs import TMobileNetV2

    sd_path = tmp_path / "mbv2.pth"
    torch.save(TMobileNetV2().state_dict(), sd_path)
    out = tmp_path / "ported.ckpt"
    port_weights.run(str(sd_path), "unet", 3, str(out))

    model = UNet(num_classes=3, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ckpt = load_checkpoint(str(out))
    params = restore_into(variables["params"], ckpt["model"])
    stats = restore_into(variables["batch_stats"], ckpt["batch_stats"])
    y = model.apply({"params": params, "batch_stats": stats},
                    jnp.zeros((1, 64, 64, 3)), train=False)
    assert y.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_resnet34_port(rng):
    """resnet34 basic-block port (round-1 VERDICT weak #7: was
    NotImplementedError)."""
    import torch

    from pytorch_segmentation_tpu.models import build_model
    from torch_refs import TResNet, _TorchBasicBlock

    sd = {k: v.numpy() for k, v in
          TResNet(_TorchBasicBlock, (3, 4, 6, 3)).state_dict().items()}
    model = build_model("unet", num_classes=2)  # any model; test converter
    from pytorch_segmentation_tpu.nn.backbones.resnet import ResNet
    rn = ResNet(block="basic", layers=(3, 4, 6, 3), dtype=jnp.float32)
    variables = rn.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        train=False)
    params, stats = load_pretrained_backbone(
        {"backbone": dict(variables["params"])},
        {"backbone": dict(variables["batch_stats"])}, sd, "resnet34")
    feats = rn.apply({"params": params["backbone"],
                      "batch_stats": stats["backbone"]},
                     jnp.zeros((1, 64, 64, 3)), train=False)
    assert feats[-1].shape[-1] == 512


# ---------------------------------------------------------------------------
# Reverse port: flax trees -> torch state_dict (port_weights.py --reverse)
# ---------------------------------------------------------------------------

def _small_flax_and_trees(rng_key=0):
    import flax.linen as fnn

    from pytorch_segmentation_tpu.nn.blocks import ConvNormAct

    class SmallFlax(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            x = ConvNormAct(8, kernel_size=3, dtype=jnp.float32,
                            name="block0")(x, train=train)
            # depthwise: exercises the (kh,kw,1,C) <-> (C,1,kh,kw) transpose
            x = ConvNormAct(8, kernel_size=3, groups=8, dtype=jnp.float32,
                            name="dw")(x, train=train)
            return fnn.Conv(4, (1, 1), dtype=jnp.float32,
                            param_dtype=jnp.float32, name="cls_conv")(x)

    model = SmallFlax()
    variables = model.init({"params": jax.random.PRNGKey(rng_key)},
                           jnp.zeros((1, 16, 16, 3)), train=False)
    params = jax.tree.map(np.asarray, dict(variables["params"]))
    stats = jax.tree.map(np.asarray, dict(variables["batch_stats"]))
    # non-trivial BN stats so eval-mode parity tests the BN math
    r = np.random.RandomState(7)
    for blk in stats.values():
        blk["bn"]["mean"] = (0.1 * r.standard_normal(
            blk["bn"]["mean"].shape)).astype(np.float32)
        blk["bn"]["var"] = (0.5 + r.uniform(
            size=blk["bn"]["var"].shape)).astype(np.float32)
    return model, params, stats


def _small_torch_mirror():
    import torch

    from torch_refs import TConvNormAct

    class SmallTorch(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.block0 = TConvNormAct(3, 8, k=3)
            self.dw = TConvNormAct(8, 8, k=3, groups=8)
            self.cls_conv = torch.nn.Conv2d(8, 4, 1)

        def forward(self, x):
            return self.cls_conv(self.dw(self.block0(x)))

    return SmallTorch()


def test_export_torch_state_dict_roundtrip():
    from pytorch_segmentation_tpu.utils.port_torch import (
        _merge_checked, convert_named, export_torch_state_dict)

    _model, params, stats = _small_flax_and_trees()
    sd = export_torch_state_dict(params, stats)
    # num_batches_tracked present for torch strict loads, int64
    assert sd["block0.bn.num_batches_tracked"].dtype == np.int64
    rp, rs = convert_named(sd)
    import copy
    p2, s2 = copy.deepcopy(params), copy.deepcopy(stats)
    _merge_checked(p2, rp, "params")
    _merge_checked(s2, rs, "stats")
    for (a, b) in ((params, p2), (stats, s2)):
        fa, fb = jax.tree.flatten(a)[0], jax.tree.flatten(b)[0]
        assert len(fa) == len(fb)
        for x, y in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_reverse_port_strict_torch_load_forward_parity(rng):
    import torch

    from pytorch_segmentation_tpu.utils.port_torch import \
        export_torch_state_dict

    model, params, stats = _small_flax_and_trees()
    sd = export_torch_state_dict(params, stats)
    tmodel = _small_torch_mirror()
    tmodel.load_state_dict({k: torch.from_numpy(np.array(v))
                            for k, v in sd.items()}, strict=True)
    tmodel.eval()

    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, x, train=False))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_reverse_port_cli(tmp_path):
    import torch

    from pytorch_segmentation_tpu.engine.checkpoint import save_checkpoint

    _model, params, stats = _small_flax_and_trees()
    ckpt = tmp_path / "small.ckpt"
    save_checkpoint(str(ckpt), params, stats)

    import port_weights
    out = tmp_path / "small_torch.pt"
    port_weights.run_reverse(str(ckpt), str(out))
    loaded = torch.load(str(out), map_location="cpu", weights_only=True)
    assert set(loaded.keys()) == {"model"}  # the reference ckpt format
    tmodel = _small_torch_mirror()
    tmodel.load_state_dict(loaded["model"], strict=True)

    # --ema on an EMA-less checkpoint must fail loudly
    with pytest.raises(SystemExit):
        port_weights.run_reverse(str(ckpt), str(out), use_ema=True)


# ---------------------------------------------------------------------------
# HuggingFace Segformer porting (models/segformer.py is a beyond-reference
# family; its pretrained zoo lives in `transformers`, not torchvision).
# The HF implementation is the INDEPENDENT oracle here: a randomized
# SegformerForSemanticSegmentation forward must match our flax forward
# through the ported weights.

def _hf_tiny_segformer(rng, num_labels=3):
    import torch
    from transformers import (SegformerConfig,
                              SegformerForSemanticSegmentation)

    cfg = SegformerConfig(
        num_channels=3, num_encoder_blocks=4, depths=[1, 1, 1, 1],
        sr_ratios=[8, 4, 2, 1], hidden_sizes=[16, 32, 64, 128],
        num_attention_heads=[1, 2, 4, 8], mlp_ratios=[4, 4, 4, 4],
        decoder_hidden_size=64, num_labels=num_labels,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        classifier_dropout_prob=0.0, drop_path_rate=0.0,
        layer_norm_eps=1e-6)
    m = SegformerForSemanticSegmentation(cfg)
    sd = m.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("running_var"):
            sd[k] = torch.from_numpy(
                rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
        else:
            sd[k] = torch.from_numpy(
                (rng.standard_normal(v.shape) * 0.2).astype(np.float32))
    m.load_state_dict(sd)
    m.eval()
    return m


def test_hf_segformer_port_forward_parity(rng):
    """Full SegformerForSemanticSegmentation (encoder + decode head +
    classifier) ports and matches the HF forward (stride-4 logits) to
    f32 precision."""
    import torch

    from pytorch_segmentation_tpu.models import SegFormer
    from pytorch_segmentation_tpu.utils.port_torch import \
        load_pretrained_segformer

    hf = _hf_tiny_segformer(rng)
    model = SegFormer(num_classes=3, variant="tiny", dtype=jnp.float32,
                      full_res_output=False)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    sd = {k: t.numpy() for k, t in hf.state_dict().items()}
    params, stats = load_pretrained_segformer(v["params"],
                                              v["batch_stats"], sd)

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits
    ref = ref.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC, stride 4
    out = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-3, np.abs(out - ref).max()


def test_hf_segformer_encoder_only_and_class_mismatch(rng):
    """A SegformerModel checkpoint (encoder only, the nvidia/mit-b* zoo
    layout) ports the backbone and leaves the decoder at init; a full
    checkpoint with a different label count keeps the model's fresh
    classifier but ports the rest of the head."""
    from pytorch_segmentation_tpu.models import SegFormer
    from pytorch_segmentation_tpu.utils.port_torch import \
        load_pretrained_segformer

    hf = _hf_tiny_segformer(rng, num_labels=7)
    full_sd = {k: t.numpy() for k, t in hf.state_dict().items()}
    # nvidia/mit-b* layout: encoder only, keys prefixed "segformer."
    enc_sd = {k: v for k, v in full_sd.items()
              if not k.startswith("decode_head.")}
    assert any(k.startswith("segformer.") for k in enc_sd)

    model = SegFormer(num_classes=3, variant="tiny", dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)

    p_enc, s_enc = load_pretrained_segformer(v["params"], v["batch_stats"],
                                             enc_sd)
    q = full_sd["segformer.encoder.block.0.0.attention.self.query.weight"]
    np.testing.assert_array_equal(
        p_enc["backbone"]["block1_0"]["attn"]["q"]["kernel"], q.T)
    # decoder untouched by an encoder-only port
    np.testing.assert_array_equal(p_enc["linear_c1"]["kernel"],
                                  np.asarray(v["params"]["linear_c1"]
                                             ["kernel"]))

    # full checkpoint, 7 labels into a 3-class model: head ports,
    # classifier stays fresh
    p_full, _ = load_pretrained_segformer(v["params"], v["batch_stats"],
                                          full_sd)
    np.testing.assert_array_equal(
        p_full["cls_conv"]["kernel"],
        np.asarray(v["params"]["cls_conv"]["kernel"]))
    fuse = full_sd["decode_head.linear_fuse.weight"]
    np.testing.assert_array_equal(
        p_full["fuse"]["conv"]["kernel"],
        fuse.transpose(2, 3, 1, 0))


def test_hf_segformer_port_cli(rng, tmp_path):
    """port_weights.py --model segformer end to end: HF .pth ->
    framework checkpoint that loads and runs."""
    import torch

    from pytorch_segmentation_tpu.engine.checkpoint import load_checkpoint

    hf = _hf_tiny_segformer(rng)
    pth = tmp_path / "hf_segformer.pth"
    torch.save(hf.state_dict(), str(pth))

    import port_weights
    out = tmp_path / "segformer_ported.ckpt"
    port_weights.run(str(pth), "segformer", 3, str(out), variant="tiny")
    ckpt = load_checkpoint(str(out))
    k = ckpt["model"]["backbone"]["patch_embed1_proj"]["kernel"]
    assert tuple(k.shape) == (7, 7, 3, 16)
    np.testing.assert_allclose(
        np.asarray(k),
        hf.state_dict()["segformer.encoder.patch_embeddings.0.proj.weight"]
        .numpy().transpose(2, 3, 1, 0))


def test_hf_mit_port_into_upernet(rng, tmp_path):
    """The HF MiT encoder ports into UPerNet (encoder='mit') — backbone
    only; the UPerHead stays at init (it has no HF counterpart)."""
    import torch

    from pytorch_segmentation_tpu.engine.checkpoint import load_checkpoint

    hf = _hf_tiny_segformer(rng)
    pth = tmp_path / "hf_mit.pth"
    torch.save(hf.segformer.state_dict(), str(pth))  # encoder-only layout

    import port_weights
    out = tmp_path / "upernet_mit.ckpt"
    port_weights.run(str(pth), "upernet", 3, str(out), variant="mit-tiny")
    ckpt = load_checkpoint(str(out))
    np.testing.assert_allclose(
        np.asarray(ckpt["model"]["backbone"]["patch_embed1_proj"]["kernel"]),
        hf.state_dict()["segformer.encoder.patch_embeddings.0.proj.weight"]
        .numpy().transpose(2, 3, 1, 0))
    assert "ppm_bottleneck" in ckpt["model"]  # head present, at init


def test_convnext_port_into_upernet(tmp_path):
    """A torchvision-named ConvNeXt classification state_dict ports into
    UPerNet (encoder='convnext') through the port_weights CLI path; the
    cn-* variant selects the convnext converter automatically. The torch
    mirror (tests/torch_refs.py TConvNeXt) generates the state_dict, so
    key layout == torchvision's convnext_tiny/small/base."""
    import torch

    from pytorch_segmentation_tpu.engine.checkpoint import load_checkpoint
    from torch_refs import TConvNeXt

    torch.manual_seed(0)
    tm = TConvNeXt()  # pico dims (16, 32, 64, 128)
    sd = tm.state_dict()
    # the real zoo file also carries the classification head; the
    # converter must ignore it
    sd["classifier.0.weight"] = torch.ones(128)
    sd["classifier.0.bias"] = torch.zeros(128)
    sd["classifier.2.weight"] = torch.zeros(10, 128)
    sd["classifier.2.bias"] = torch.zeros(10)
    pth = tmp_path / "convnext_pico.pth"
    torch.save(sd, str(pth))

    import port_weights
    out = tmp_path / "upernet_cn.ckpt"
    port_weights.run(str(pth), "upernet", 3, str(out), variant="cn-pico")
    ckpt = load_checkpoint(str(out))
    bb = ckpt["model"]["backbone"]
    np.testing.assert_allclose(
        np.asarray(bb["stem_conv"]["kernel"]),
        sd["features.0.0.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(bb["stage3_block0"]["gamma"]),
        sd["features.7.0.layer_scale"].numpy().reshape(-1))
    assert "ppm_bottleneck" in ckpt["model"]  # head present, at init


def test_swin_port_into_upernet(tmp_path):
    """A torchvision-named Swin classification state_dict ports into
    UPerNet (encoder='swin') through the port_weights CLI path; the
    swin-* variant selects the swin converter automatically, and the
    relative_position_index buffers / classification head are dropped."""
    import torch

    from pytorch_segmentation_tpu.engine.checkpoint import load_checkpoint
    from torch_refs import TSwin

    torch.manual_seed(0)
    tm = TSwin()  # pico config (depths (1,2,2,1), dim 16, window 4)
    sd = tm.state_dict()
    sd["norm.weight"] = torch.ones(128)  # final LN + head, as in the zoo
    sd["norm.bias"] = torch.zeros(128)
    sd["head.weight"] = torch.zeros(10, 128)
    sd["head.bias"] = torch.zeros(10)
    pth = tmp_path / "swin_pico.pth"
    torch.save(sd, str(pth))

    import port_weights
    out = tmp_path / "upernet_swin.ckpt"
    port_weights.run(str(pth), "upernet", 3, str(out), variant="swin-pico")
    ckpt = load_checkpoint(str(out))
    bb = ckpt["model"]["backbone"]
    np.testing.assert_allclose(
        np.asarray(bb["patch_conv"]["kernel"]),
        sd["features.0.0.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(bb["stage1_block1"]["attn"]["rpb"]),
        sd["features.3.1.attn.relative_position_bias_table"].numpy())
    np.testing.assert_allclose(
        np.asarray(bb["merge2"]["reduction"]["kernel"]),
        sd["features.4.reduction.weight"].numpy().T)
    assert "ppm_bottleneck" in ckpt["model"]  # head present, at init


def _tv_zoo_module(head="deeplabv3", num_classes=21, aux=True):
    """A torchvision-NAMED segmentation-zoo module (fcn_resnet50 /
    deeplabv3_resnet50 state_dict layout) for exercising convert_tv_seg
    — the production converter for real zoo .pth files."""
    import torch
    from torch import nn as tnn
    from torch_refs import TResNet, _TorchBottleneck

    class _ASPP(tnn.Module):
        def __init__(self):
            super().__init__()
            def cna(k, d=1):
                pad = 0 if k == 1 else d
                return tnn.Sequential(
                    tnn.Conv2d(2048, 256, k, padding=pad, dilation=d,
                               bias=False),
                    tnn.BatchNorm2d(256), tnn.ReLU())
            self.convs = tnn.ModuleList(
                [cna(1), cna(3, 12), cna(3, 24), cna(3, 36),
                 tnn.Sequential(tnn.AdaptiveAvgPool2d(1),
                                tnn.Conv2d(2048, 256, 1, bias=False),
                                tnn.BatchNorm2d(256), tnn.ReLU())])
            self.project = tnn.Sequential(
                tnn.Conv2d(5 * 256, 256, 1, bias=False),
                tnn.BatchNorm2d(256), tnn.ReLU(), tnn.Dropout(0.5))

    class _Zoo(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = TResNet(_TorchBottleneck, (3, 4, 6, 3),
                                    (False, True, True))
            if head == "deeplabv3":
                self.classifier = tnn.Sequential(
                    _ASPP(), tnn.Conv2d(256, 256, 3, padding=1,
                                        bias=False),
                    tnn.BatchNorm2d(256), tnn.ReLU(),
                    tnn.Conv2d(256, num_classes, 1))
            else:  # fcn
                self.classifier = tnn.Sequential(
                    tnn.Conv2d(2048, 512, 3, padding=1, bias=False),
                    tnn.BatchNorm2d(512), tnn.ReLU(), tnn.Dropout(0.1),
                    tnn.Conv2d(512, num_classes, 1))
            if aux:
                self.aux_classifier = tnn.Sequential(
                    tnn.Conv2d(1024, 256, 3, padding=1, bias=False),
                    tnn.BatchNorm2d(256), tnn.ReLU(), tnn.Dropout(0.1),
                    tnn.Conv2d(256, num_classes, 1))

    torch.manual_seed(0)
    return _Zoo()


def test_tvseg_zoo_port_deeplabv3(tmp_path):
    """A full deeplabv3_resnet50-layout checkpoint ports through the
    port_weights CLI path: ASPP branches, pool branch, project, head,
    class conv (nc matches), and the aux head is DROPPED because the
    eval model is built without aux."""
    import torch

    from pytorch_segmentation_tpu.engine.checkpoint import load_checkpoint

    m = _tv_zoo_module("deeplabv3", num_classes=5, aux=True)
    sd = m.state_dict()
    pth = tmp_path / "dlv3_r50.pth"
    torch.save(sd, str(pth))

    import port_weights
    out = tmp_path / "dlv3.ckpt"
    port_weights.run(str(pth), "deeplabv3", 5, str(out))
    ckpt = load_checkpoint(str(out))
    p = ckpt["model"]
    np.testing.assert_allclose(
        np.asarray(p["aspp_b2"]["conv"]["kernel"]),
        sd["classifier.0.convs.2.0.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(p["aspp_pool"]["conv"]["kernel"]),
        sd["classifier.0.convs.4.1.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(p["aspp_project"]["bn"]["scale"]),
        sd["classifier.0.project.1.weight"].numpy())
    np.testing.assert_allclose(
        np.asarray(p["cls_conv"]["bias"]),
        sd["classifier.4.bias"].numpy())
    np.testing.assert_allclose(
        np.asarray(ckpt["batch_stats"]["head"]["bn"]["mean"]),
        sd["classifier.2.running_mean"].numpy())
    assert "aux_head" not in p  # eval model has no aux head


def test_tvseg_zoo_port_fcn_class_gate(tmp_path):
    """FCN layout; a class-count MISMATCH keeps the init class conv
    (the nc=21 zoo head must not port into an nc=3 model) while the
    backbone+head CNA still port; the aux head ports when the model is
    built with aux=True."""
    import torch

    from pytorch_segmentation_tpu.models import FCN
    from pytorch_segmentation_tpu.utils.port_torch import (
        jax_to_py, load_pretrained_tvseg)

    m = _tv_zoo_module("fcn", num_classes=21, aux=True)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}

    model = FCN(num_classes=3, aux=True, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False)
    init_cls = np.asarray(variables["params"]["cls_conv"]["kernel"])
    params, stats = load_pretrained_tvseg(
        jax_to_py(variables["params"]), jax_to_py(variables["batch_stats"]),
        sd, num_classes=3)
    np.testing.assert_allclose(
        np.asarray(params["head"]["conv"]["kernel"]),
        sd["classifier.0.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(np.asarray(params["cls_conv"]["kernel"]),
                                  init_cls)  # gated: nc 21 != 3
    np.testing.assert_allclose(
        np.asarray(params["aux_head"]["aux_conv"]["conv"]["kernel"]),
        sd["aux_classifier.0.weight"].transpose(2, 3, 1, 0))
    # forward still runs with the merged trees
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    assert out.shape == (1, 64, 64, 3)


def test_lraspp_zoo_port(tmp_path):
    """A full lraspp_mobilenet_v3_large-layout checkpoint (torchvision
    `classifier.cbr/scale/low_classifier/high_classifier` naming) ports
    through the port_weights CLI path."""
    import torch
    from torch import nn as tnn

    from pytorch_segmentation_tpu.engine.checkpoint import load_checkpoint
    from torch_refs import TMobileNetV3

    class _Zoo(tnn.Module):
        def __init__(self, nc):
            super().__init__()
            self.backbone = TMobileNetV3(dilated=True)

            class _Head(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.cbr = tnn.Sequential(
                        tnn.Conv2d(960, 128, 1, bias=False),
                        tnn.BatchNorm2d(128), tnn.ReLU())
                    self.scale = tnn.Sequential(
                        tnn.AdaptiveAvgPool2d(1),
                        tnn.Conv2d(960, 128, 1, bias=False), tnn.Sigmoid())
                    self.low_classifier = tnn.Conv2d(40, nc, 1)
                    self.high_classifier = tnn.Conv2d(128, nc, 1)

            self.classifier = _Head()

    torch.manual_seed(0)
    m = _Zoo(nc=4)
    sd = m.state_dict()
    pth = tmp_path / "lraspp.pth"
    torch.save(sd, str(pth))

    import port_weights
    out = tmp_path / "lraspp.ckpt"
    port_weights.run(str(pth), "lraspp", 4, str(out))
    ckpt = load_checkpoint(str(out))
    p = ckpt["model"]
    np.testing.assert_allclose(
        np.asarray(p["scale_conv"]["kernel"]),
        sd["classifier.scale.1.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(p["low_classifier"]["bias"]),
        sd["classifier.low_classifier.bias"].numpy())
    # SE port: block 3 (first SE row, expanded 72 -> squeeze 24)
    np.testing.assert_allclose(
        np.asarray(p["backbone"]["block3"]["se"]["fc1"]["kernel"]),
        sd["backbone.features.4.block.2.fc1.weight"].numpy()
          .transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(ckpt["batch_stats"]["backbone"]["block0"]["depthwise"]
                   ["bn"]["var"]),
        sd["backbone.features.1.block.0.1.running_var"].numpy())
