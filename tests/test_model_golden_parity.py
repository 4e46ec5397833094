"""FULL-MODEL golden parity vs torch-reconstructed reference models.

The strongest achievable proxy for the ±0.2 VOC mIoU north star in a
no-data environment (BASELINE.json): the reference UNet / DeepLabV3+ /
HRNet are rebuilt in torch (tests/torch_refs.py, from the documented
pytorch_modules contracts + /root/reference/models/*.py math), weights are
ported through utils/port_torch (the same converters used for real
torchvision zoo files), and f32 forward activations must agree to <1e-3
max-abs at 320x320 — composition errors in tap selection, resize
conventions, stage wiring, or dilation would all surface here. One gradient
check per model covers the backward pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pytorch_segmentation_tpu.models import (FCN, FPN, LRASPP,
                                              MaskFormer, BiSeNetV2,
                                              DANet, DeepLabV3,
                                              DeepLabV3Plus,
                                              HRNet, OCRNet, PSPNet,
                                              SegFormer, Segmenter,
                                              SegNeXt, UNet, UPerNet)
from pytorch_segmentation_tpu.utils.port_torch import (
    _merge_checked, convert_convnext, convert_mobilenetv2,
    convert_mobilenetv3, convert_named, convert_resnet, convert_swin,
    convert_vit, jax_to_py)

from torch_refs import (TFPN, TLRASPP, TMaskFormer,
                        TBiSeNetV2, TDANet, TDeepLabV3Plus,
                        THRNet,
                        TOCRNet, TPSPNet, TSegFormer, TSegmenter,
                        TSegNeXt, TTVDeepLabV3, TTVFCN, TUNet, TUPerNet,
                        TViT, randomize_bn_stats)


def _split_sd(model, prefix="backbone."):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    bb = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    rest = {k: v for k, v in sd.items() if not k.startswith(prefix)}
    return bb, rest


def _port(flax_model, tmodel, backbone_converter, sample_hw=(64, 64)):
    """Init the flax model, overwrite every param/stat from the torch
    state_dict, return (variables, params, stats as plain dicts)."""
    variables = flax_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, sample_hw[0], sample_hw[1], 3), jnp.float32),
        train=False)
    params = jax_to_py(variables["params"])
    # segmenter is all-LayerNorm: no batch_stats collection at all
    stats = jax_to_py(variables.get("batch_stats", {}))

    if backbone_converter is not None:
        bb_sd, rest_sd = _split_sd(tmodel)
        bp, bs = backbone_converter(bb_sd)
        _merge_checked(params["backbone"], bp, "params.backbone")
        if bs:  # ConvNeXt is all-LayerNorm: no backbone batch stats
            _merge_checked(stats["backbone"], bs, "stats.backbone")
    else:
        _, rest_sd = {}, {k: v.detach().numpy()
                          for k, v in tmodel.state_dict().items()}
    rp, rs = convert_named(rest_sd)
    _merge_checked(params, rp, "params")
    _merge_checked(stats, rs, "stats")
    return {"params": params, "batch_stats": stats}


def _forward_torch(tmodel, x_nhwc):
    with torch.no_grad():
        t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
        out = tmodel(t)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


CASES = {
    "unet": (lambda nc: UNet(num_classes=nc, dtype=jnp.float32),
             TUNet, convert_mobilenetv2),
    "deeplabv3plus": (
        lambda nc: DeepLabV3Plus(num_classes=nc, dtype=jnp.float32),
        TDeepLabV3Plus, convert_resnet),
    "hrnet": (lambda nc: HRNet(num_classes=nc, dtype=jnp.float32),
              THRNet, None),
    # w18 keeps the 1-core CPU compile affordable; the OCR head widths
    # (512/256) are the full mmseg config either way
    "ocrnet": (lambda nc: OCRNet(num_classes=nc, base_channels=18,
                                 dtype=jnp.float32),
               lambda nc: TOCRNet(nc, base=18), None),
    "pspnet": (lambda nc: PSPNet(num_classes=nc, dtype=jnp.float32),
               TPSPNet, convert_resnet),
    # dual attention (PAM softmax position attention + CAM
    # rowmax-minus-energy channel attention) with the branch gammas
    # ported to 0.5 so the attention paths contribute to the parity
    "danet": (lambda nc: DANet(num_classes=nc, dtype=jnp.float32),
              TDANet, convert_resnet),
    "fpn": (lambda nc: FPN(num_classes=nc, dtype=jnp.float32),
            TFPN, convert_resnet),
    "fastfcn": (lambda nc: PSPNet(num_classes=nc, jpu=True,
                                  dtype=jnp.float32),
                lambda nc: TPSPNet(nc, jpu=True), convert_resnet),
    "segformer": (lambda nc: SegFormer(num_classes=nc, dtype=jnp.float32),
                  TSegFormer, None),
    # MSCAN conv-attention encoder + LightHam NMF decoder at the 1-block
    # 'tiny' dims; exercises the deterministic-bases NMF (7 eval steps of
    # multiplicative updates must agree through f32), layer scales, GN
    "segnext": (lambda nc: SegNeXt(num_classes=nc, variant="tiny",
                                   dtype=jnp.float32),
                lambda nc: TSegNeXt(nc, variant="tiny"), None),
    # torchvision segmentation-zoo families (models/tvseg.py): os=8
    # backbone, align_corners=False trailing upsample
    "fcn": (lambda nc: FCN(num_classes=nc, dtype=jnp.float32),
            TTVFCN, convert_resnet),
    "deeplabv3": (lambda nc: DeepLabV3(num_classes=nc, dtype=jnp.float32),
                  TTVDeepLabV3, convert_resnet),
    # LR-ASPP on dilated MobileNetV3-Large; the torchvision-named
    # backbone mirror exercises convert_mobilenetv3 (SE indices,
    # variable block Sequential layout, dilated tail)
    "lraspp": (lambda nc: LRASPP(num_classes=nc, dtype=jnp.float32),
               TLRASPP, convert_mobilenetv3),
    "bisenetv2": (lambda nc: BiSeNetV2(num_classes=nc, dtype=jnp.float32),
                  TBiSeNetV2, None),
    "upernet": (lambda nc: UPerNet(num_classes=nc, dtype=jnp.float32),
                TUPerNet, convert_resnet),
    # MiT-encoder UPerNet at the 1-block 'tiny' dims (affordable compile;
    # the encoder itself carries full golden parity via 'segformer')
    "upernet-mit": (
        lambda nc: UPerNet(num_classes=nc, encoder="mit",
                           mit_variant="tiny", dtype=jnp.float32),
        lambda nc: TUPerNet(nc, encoder="mit", mit_dims=(16, 32, 64, 128),
                            mit_depths=(1, 1, 1, 1), mit_heads=(1, 2, 4, 8)),
        None),
    # ConvNeXt-encoder UPerNet at the 1-block 'pico' dims; the torch
    # mirror uses torchvision `features.*` naming so this exercises
    # convert_convnext (the production path for real zoo weights).
    # layer_scale 0.5 (vs the 1e-6 init) so block outputs actually
    # contribute — at 1e-6 a broken fc1/fc2 port would still "pass".
    "upernet-cn": (
        lambda nc: UPerNet(num_classes=nc, encoder="convnext",
                           convnext_variant="pico", dtype=jnp.float32),
        lambda nc: TUPerNet(nc, encoder="convnext", cn_layer_scale=0.5),
        convert_convnext),
    # Swin-encoder UPerNet at the (1,2,2,1)-depth 'pico' dims (window 4):
    # at 320^2 the odd blocks run SHIFTED windows with the 9-region mask
    # at two resolutions; the torchvision-named mirror exercises
    # convert_swin. The 96^2 gradient test adds the window-padding path
    # (stage maps 24/12/6/3: stage 3 pads 6->8; stage 4 pads 3->4 with
    # shift disabled because the window covers the padded axis).
    "upernet-swin": (
        lambda nc: UPerNet(num_classes=nc, encoder="swin",
                           swin_variant="pico", dtype=jnp.float32),
        lambda nc: TUPerNet(nc, encoder="swin"),
        convert_swin),
    # plain-ViT encoder at the 4-layer 'pico' dims: the torchvision-named
    # mirror (fused in_proj MHA, class token, pos embedding) exercises
    # convert_vit; at 320^2 the 4x4 pos grid interpolates to 20x20, so
    # the trace-time resize path is in the parity circuit too
    "upernet-vit": (
        lambda nc: UPerNet(num_classes=nc, encoder="vit",
                           vit_variant="pico", dtype=jnp.float32),
        lambda nc: TUPerNet(nc, encoder="vit"),
        convert_vit),
    # ViT + Mask Transformer: the L2-normalized class/patch dot-product
    # decoder and the bare cls_emb Parameter port (convert_named verbatim
    # leaf rule) are in the parity circuit
    "segmenter": (
        lambda nc: Segmenter(num_classes=nc, variant="pico",
                             dtype=jnp.float32),
        TSegmenter, convert_vit),
    # mask classification (set prediction): the eval-mode semantic scores
    # are the softmax/sigmoid composition of BOTH heads, so matching them
    # transitively pins the query transformer, pixel decoder, class head
    # and mask-embedding MLP (models/maskformer.py; query_embed ports
    # verbatim, sine pos embeddings are identical constants)
    "maskformer": (
        lambda nc: MaskFormer(num_classes=nc, dtype=jnp.float32),
        TMaskFormer, convert_resnet),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_full_model_forward_parity_320(name, rng):
    build, tcls, conv = CASES[name]
    nc = 4
    torch.manual_seed(0)
    tmodel = tcls(nc)
    randomize_bn_stats(tmodel, seed=1)
    tmodel.eval()

    model = build(nc)
    variables = _port(model, tmodel, conv)

    x = rng.standard_normal((1, 320, 320, 3)).astype(np.float32)
    ours = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x))
    ref = _forward_torch(tmodel, x)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    diff = np.abs(ours - ref).max()
    assert diff < 1e-3, f"{name}: max-abs {diff}"


@pytest.mark.parametrize("name", sorted(CASES))
def test_full_model_gradient_parity(name, rng):
    """d(mean CE)/d(classifier kernel) matches torch autograd (96x96 input
    to keep the 1-core backward affordable)."""
    build, tcls, conv = CASES[name]
    nc = 3
    torch.manual_seed(0)
    tmodel = tcls(nc)
    randomize_bn_stats(tmodel, seed=2)
    tmodel.eval()  # eval-mode BN; grads still flow through conv weights

    model = build(nc)
    variables = _port(model, tmodel, conv)

    x = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    labels = rng.integers(0, nc, (1, 96, 96)).astype(np.int32)
    # spot-check module: a conv head, or (for segmenter) the decoder's
    # proj_dec Linear — "a/b" paths walk nested modules
    head = {"hrnet": "final_layer", "lraspp": "high_classifier",
            "segmenter": "decoder/proj_dec",
            "maskformer": "pixel_proj"}.get(name, "cls_conv")
    top = head.split("/")[0]

    def loss_fn(head_params):
        p = dict(variables["params"])
        p[top] = head_params
        logits = model.apply({"params": p,
                              "batch_stats": variables["batch_stats"]},
                             x, train=False).astype(jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        true = jnp.take_along_axis(logits, labels[..., None],
                                   axis=-1)[..., 0]
        return jnp.mean(lse - true)

    g = jax.grad(loss_fn)(variables["params"][top])
    tmod = tmodel
    for part in head.split("/"):
        tmod = getattr(tmod, part)
        if part != top:
            g = g[part]

    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    out = tmodel(t)
    tl = F.cross_entropy(out, torch.from_numpy(labels).long())
    tl.backward()
    tw = tmod.weight.grad.numpy()
    tg_k = np.transpose(tw, (2, 3, 1, 0)) if tw.ndim == 4 \
        else np.ascontiguousarray(tw.T)  # OIHW->HWIO / Linear [o,i]->[i,o]
    tg_b = tmod.bias.grad.numpy()
    # segmenter: the L2-normalize backward (rsqrt chain through 6 joint
    # layers) amplifies f32 reduction-order noise on near-zero grads —
    # measured grad cosine 0.99999994 / norm match 1e-4-relative with a
    # ~3e-4 worst-element tail, so the abs floor is raised
    atol = 5e-4 if name == "segmenter" else 1e-5
    np.testing.assert_allclose(np.asarray(g["kernel"]), tg_k,
                               rtol=1e-3, atol=atol)
    np.testing.assert_allclose(np.asarray(g["bias"]), tg_b,
                               rtol=1e-3, atol=atol)
