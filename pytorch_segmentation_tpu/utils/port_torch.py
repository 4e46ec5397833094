"""Pretrained-backbone weight porting: torchvision state_dict -> our trees.

The reference gets ImageNet-pretrained encoders from pytorch_modules
(`mobilenet_v2(pretrained=True)`, unet.py:16; `resnet50(pretrained=True)`,
deeplabv3plus.py:17). This environment has no network access, so
`pretrained=True` cannot download; instead, users supply a torchvision
state_dict file (`.pth`, as produced by torchvision's model zoo) and this
module maps it onto the backbone param/batch-stat subtrees
(SURVEY.md §7 hard part (c)).

Layout conversions: torch conv OIHW -> JAX HWIO; depthwise (C,1,kh,kw) ->
(kh,kw,1,C); BN weight/bias/running_mean/running_var ->
scale/bias/mean/var (all f32).
"""

from __future__ import annotations

import numpy as np

__all__ = ["convert_mobilenetv2", "convert_mobilenetv3", "convert_resnet",
           "convert_convnext",
           "convert_swin", "convert_vit", "convert_named",
           "convert_tv_seg",
           "convert_hf_segformer", "load_pretrained_backbone",
           "load_pretrained_segformer", "load_pretrained_tvseg",
           "export_torch_state_dict", "save_torch_checkpoint"]

# standard MobileNetV2 stage layout: (expand_ratio, repeats)
_MBV2_STAGES = [(1, 1), (6, 2), (6, 3), (6, 4), (6, 3), (6, 3), (6, 1)]


def _conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0))
                                ).astype(np.float32)


def _bn(sd, prefix):
    return (
        {"scale": np.asarray(sd[prefix + ".weight"], np.float32),
         "bias": np.asarray(sd[prefix + ".bias"], np.float32)},
        {"mean": np.asarray(sd[prefix + ".running_mean"], np.float32),
         "var": np.asarray(sd[prefix + ".running_var"], np.float32)},
    )


def _cna(sd, conv_key, bn_prefix):
    """(params, stats) for one ConvNormAct."""
    bn_p, bn_s = _bn(sd, bn_prefix)
    return ({"conv": {"kernel": _conv(sd[conv_key])}, "bn": bn_p},
            {"bn": bn_s})


def convert_mobilenetv2(sd: dict):
    """torchvision mobilenet_v2 state_dict -> (params, batch_stats) subtrees
    matching nn/backbones/mobilenetv2.MobileNetV2."""
    params, stats = {}, {}
    params["stem"], stats["stem"] = _cna(sd, "features.0.0.weight",
                                         "features.0.1")
    feat = 1
    for stage_i, (t, n) in enumerate(_MBV2_STAGES):
        for block_i in range(n):
            name = f"stage{stage_i}_block{block_i}"
            base = f"features.{feat}.conv"
            p, s = {}, {}
            if t == 1:
                p["depthwise"], s["depthwise"] = _cna(
                    sd, base + ".0.0.weight", base + ".0.1")
                p["project"], s["project"] = _cna(
                    sd, base + ".1.weight", base + ".2")
            else:
                p["expand"], s["expand"] = _cna(
                    sd, base + ".0.0.weight", base + ".0.1")
                p["depthwise"], s["depthwise"] = _cna(
                    sd, base + ".1.0.weight", base + ".1.1")
                p["project"], s["project"] = _cna(
                    sd, base + ".2.weight", base + ".3")
            params[name], stats[name] = p, s
            feat += 1
    params["head"], stats["head"] = _cna(sd, "features.18.0.weight",
                                         "features.18.1")
    return params, stats


def convert_resnet(sd: dict, layers=(3, 4, 6, 3)):
    """torchvision resnet (bottleneck) state_dict -> (params, batch_stats)
    subtrees matching nn/backbones/resnet.ResNet."""
    params, stats = {}, {}
    params["stem"], stats["stem"] = _cna(sd, "conv1.weight", "bn1")
    for li, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            name = f"layer{li + 1}_block{b}"
            base = f"layer{li + 1}.{b}"
            p, s = {}, {}
            for ci in (1, 2, 3):
                key = f"conv{ci}"
                if base + f".conv{ci}.weight" not in sd:
                    continue  # basic blocks have conv1/conv2 only
                p[key], s[key] = _cna(sd, base + f".conv{ci}.weight",
                                      base + f".bn{ci}")
            if base + ".downsample.0.weight" in sd:
                p["downsample"], s["downsample"] = _cna(
                    sd, base + ".downsample.0.weight", base + ".downsample.1")
            params[name], stats[name] = p, s
    return params, stats


def convert_convnext(sd: dict):
    """torchvision convnext_{tiny,small,base} classification state_dict ->
    (params, batch_stats) subtrees matching nn/backbones/convnext.ConvNeXt.

    torchvision layout (`features.*` Sequential): features.0 = stem
    (conv 4x4 s4 at .0, LayerNorm2d at .1); odd indices 1/3/5/7 = block
    stages (each CNBlock: block.0 dwconv, block.2 LN, block.3 Linear 4C,
    block.5 Linear C, plus a (C,1,1) `layer_scale` parameter); even
    indices 2/4/6 = downsample (LayerNorm2d at .0, conv 2x2 s2 at .1).
    The classifier head (avgpool LN + Linear) is dropped. LayerNorms
    carry no running stats, so batch_stats is empty."""
    def dense(prefix):
        return {"kernel": np.ascontiguousarray(
                    np.asarray(sd[prefix + ".weight"], np.float32).T),
                "bias": np.asarray(sd[prefix + ".bias"], np.float32)}

    def ln(prefix):
        return {"scale": np.asarray(sd[prefix + ".weight"], np.float32),
                "bias": np.asarray(sd[prefix + ".bias"], np.float32)}

    def conv(prefix):
        return {"kernel": _conv(sd[prefix + ".weight"]),
                "bias": np.asarray(sd[prefix + ".bias"], np.float32)}

    params = {"stem_conv": conv("features.0.0"),
              "stem_norm": ln("features.0.1")}
    for s in range(4):
        feat = 2 * s + 1
        if s > 0:
            params[f"down{s}_norm"] = ln(f"features.{feat - 1}.0")
            params[f"down{s}_conv"] = conv(f"features.{feat - 1}.1")
        depth = 1 + max(int(k.split(".")[2]) for k in sd
                        if k.startswith(f"features.{feat}."))
        for b in range(depth):
            base = f"features.{feat}.{b}"
            params[f"stage{s}_block{b}"] = {
                "dwconv": conv(base + ".block.0"),
                "norm": ln(base + ".block.2"),
                "fc1": dense(base + ".block.3"),
                "fc2": dense(base + ".block.5"),
                "gamma": np.asarray(sd[base + ".layer_scale"],
                                    np.float32).reshape(-1),
            }
    return params, {}


def convert_swin(sd: dict):
    """torchvision swin_{t,s,b} (v1) classification state_dict ->
    (params, batch_stats) subtrees matching
    nn/backbones/swin.SwinTransformer.

    torchvision layout (`features.*` Sequential): features.0 = patch
    embed (conv 4x4 s4 at .0, LayerNorm at .2 — .1 is a param-free
    Permute); odd indices 1/3/5/7 = block stages (each
    SwinTransformerBlock: norm1, attn.{qkv,proj,
    relative_position_bias_table}, norm2, mlp.0 / mlp.3 Linears); even
    indices 2/4/6 = PatchMerging (reduction Linear no-bias + norm).
    `attn.relative_position_index` buffers are dropped (recomputed at
    trace time), as are the classification head (`head.*`) and its
    final `norm.*`. LayerNorms carry no running stats, so batch_stats
    is empty."""
    def dense(prefix, bias=True):
        out = {"kernel": np.ascontiguousarray(
                   np.asarray(sd[prefix + ".weight"], np.float32).T)}
        if bias:
            out["bias"] = np.asarray(sd[prefix + ".bias"], np.float32)
        return out

    def ln(prefix):
        return {"scale": np.asarray(sd[prefix + ".weight"], np.float32),
                "bias": np.asarray(sd[prefix + ".bias"], np.float32)}

    params = {"patch_conv": {
                  "kernel": _conv(sd["features.0.0.weight"]),
                  "bias": np.asarray(sd["features.0.0.bias"], np.float32)},
              "patch_norm": ln("features.0.2")}
    for s in range(4):
        feat = 2 * s + 1
        if s > 0:
            params[f"merge{s}"] = {
                "norm": ln(f"features.{feat - 1}.norm"),
                "reduction": dense(f"features.{feat - 1}.reduction",
                                   bias=False)}
        depth = 1 + max(int(k.split(".")[2]) for k in sd
                        if k.startswith(f"features.{feat}."))
        for b in range(depth):
            base = f"features.{feat}.{b}"
            params[f"stage{s}_block{b}"] = {
                "norm1": ln(base + ".norm1"),
                "attn": {
                    "qkv": dense(base + ".attn.qkv"),
                    "proj": dense(base + ".attn.proj"),
                    "rpb": np.asarray(
                        sd[base + ".attn.relative_position_bias_table"],
                        np.float32)},
                "norm2": ln(base + ".norm2"),
                "fc1": dense(base + ".mlp.0"),
                "fc2": dense(base + ".mlp.3"),
            }
    return params, {}


def convert_mobilenetv3(sd: dict):
    """torchvision mobilenet_v3_large state_dict (classification OR the
    backbone of lraspp_mobilenet_v3_large — same `features.*` keys) ->
    (params, batch_stats) subtrees matching
    nn/backbones/mobilenetv3.MobileNetV3.

    Block Sequential indices vary with the row config: [expand?]
    depthwise [SE?] project — resolved from MOBILENETV3_LARGE_CFG. The
    classification head (`classifier.*`, `features.16` stays: that 1x1
    960 conv IS our "head" tap) is otherwise dropped; SE convs carry
    biases (plain convs, no BN)."""
    from ..nn.backbones.mobilenetv3 import MOBILENETV3_LARGE_CFG

    params, stats = {}, {}
    params["stem"], stats["stem"] = _cna(sd, "features.0.0.weight",
                                         "features.0.1")
    cin = 16
    for i, (k, exp, out, use_se, _hs, _s) in enumerate(
            MOBILENETV3_LARGE_CFG):
        base = f"features.{i + 1}.block"
        p, s = {}, {}
        li = 0
        if exp != cin:
            p["expand"], s["expand"] = _cna(sd, f"{base}.{li}.0.weight",
                                            f"{base}.{li}.1")
            li += 1
        p["depthwise"], s["depthwise"] = _cna(sd, f"{base}.{li}.0.weight",
                                              f"{base}.{li}.1")
        li += 1
        if use_se:
            p["se"] = {
                "fc1": {"kernel": _conv(sd[f"{base}.{li}.fc1.weight"]),
                        "bias": np.asarray(sd[f"{base}.{li}.fc1.bias"],
                                           np.float32)},
                "fc2": {"kernel": _conv(sd[f"{base}.{li}.fc2.weight"]),
                        "bias": np.asarray(sd[f"{base}.{li}.fc2.bias"],
                                           np.float32)}}
            li += 1
        p["project"], s["project"] = _cna(sd, f"{base}.{li}.0.weight",
                                          f"{base}.{li}.1")
        params[f"block{i}"], stats[f"block{i}"] = p, s
        cin = out
    params["head"], stats["head"] = _cna(sd, "features.16.0.weight",
                                         "features.16.1")
    return params, stats


def convert_tv_seg(sd: dict, num_classes=None):
    """torchvision SEGMENTATION-zoo checkpoint (fcn_resnet50/101,
    deeplabv3_resnet50/101, or lraspp_mobilenet_v3_large: `backbone.*`
    + `classifier.*` [+ `aux_classifier.*`]) -> (params, batch_stats)
    trees for models/tvseg.FCN / DeepLabV3 / models/lraspp.LRASPP.

    torchvision layout: classifier = FCNHead Sequential (0 conv3x3
    no-bias, 1 BN, 2 ReLU, 3 Dropout, 4 class conv) for FCN;
    DeepLabHead (0 ASPP{convs.0 1x1, convs.1-3 dilated 3x3, convs.4
    pooling[1 conv, 2 bn], project[0 conv, 1 bn]}, 1 conv3x3, 2 BN,
    4 class conv) for DeepLabV3. The head class convs port only when
    their out-channels match `num_classes` (pass None to force); the
    aux head ports under "aux_head" when present (dropped by the
    caller when the model was built without aux). ResNet depth
    (r50/r101) is inferred from the layer3 block count."""
    bsd = {k[len("backbone."):]: v for k, v in sd.items()
           if k.startswith("backbone.")}

    def cls_conv(prefix):
        w = sd[prefix + ".weight"]
        if num_classes is not None and w.shape[0] != num_classes:
            return None  # class-count mismatch: keep the init head
        return {"kernel": _conv(w),
                "bias": np.asarray(sd[prefix + ".bias"], np.float32)}

    if "classifier.cbr.0.weight" in sd:  # LRASPP (mobilenet_v3 backbone)
        bp, bs = convert_mobilenetv3(bsd)
        params, stats = {"backbone": bp}, {"backbone": bs}
        params["cbr"], stats["cbr"] = _cna(sd, "classifier.cbr.0.weight",
                                           "classifier.cbr.1")
        params["scale_conv"] = {
            "kernel": _conv(sd["classifier.scale.1.weight"])}
        for head in ("low_classifier", "high_classifier"):
            c = cls_conv(f"classifier.{head}")
            if c is not None:
                params[head] = c
        return params, stats

    n3 = 1 + max(int(k.split(".")[1]) for k in bsd
                 if k.startswith("layer3."))
    layers = (3, 4, n3, 3)
    bp, bs = convert_resnet(bsd, layers=layers)
    params, stats = {"backbone": bp}, {"backbone": bs}

    if "classifier.0.convs.0.0.weight" in sd:  # DeepLabHead
        for i in range(4):
            params[f"aspp_b{i}"], stats[f"aspp_b{i}"] = _cna(
                sd, f"classifier.0.convs.{i}.0.weight",
                f"classifier.0.convs.{i}.1")
        params["aspp_pool"], stats["aspp_pool"] = _cna(
            sd, "classifier.0.convs.4.1.weight", "classifier.0.convs.4.2")
        params["aspp_project"], stats["aspp_project"] = _cna(
            sd, "classifier.0.project.0.weight", "classifier.0.project.1")
        params["head"], stats["head"] = _cna(
            sd, "classifier.1.weight", "classifier.2")
    else:  # FCNHead
        params["head"], stats["head"] = _cna(
            sd, "classifier.0.weight", "classifier.1")
    head_cls = cls_conv("classifier.4")
    if head_cls is not None:
        params["cls_conv"] = head_cls
    if "aux_classifier.0.weight" in sd:
        ap, as_ = _cna(sd, "aux_classifier.0.weight", "aux_classifier.1")
        params["aux_head"] = {"aux_conv": ap}
        stats["aux_head"] = {"aux_conv": as_}
        aux_cls = cls_conv("aux_classifier.4")
        if aux_cls is not None:
            params["aux_head"]["aux_cls"] = aux_cls
    return params, stats


def load_pretrained_tvseg(model_params, model_stats, path_or_sd,
                          num_classes=None):
    """Merge a torchvision segmentation-zoo checkpoint into an
    FCN/DeepLabV3 model's trees (full model: backbone + heads). The aux
    head is dropped when the model was built without one; class convs
    port only on channel match (convert_tv_seg)."""
    import copy

    if isinstance(path_or_sd, (str, bytes)):
        import torch
        sd = torch.load(path_or_sd, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = {k: np.asarray(v) for k, v in path_or_sd.items()}
    p, s = convert_tv_seg(sd, num_classes=num_classes)
    params = copy.deepcopy(jax_to_py(model_params))
    stats = copy.deepcopy(jax_to_py(model_stats))
    if "aux_head" in p and "aux_head" not in params:
        p.pop("aux_head")
        s.pop("aux_head", None)
    _merge_checked(params, p, "params")
    _merge_checked(stats, s, "stats")
    return params, stats


def convert_vit(sd: dict):
    """torchvision vit_b_16 / vit_l_16 classification state_dict ->
    (params, batch_stats) subtrees matching nn/backbones/vit.ViT.

    torchvision layout: conv_proj (patch conv), class_token,
    encoder.pos_embedding [1, 1+196, C], encoder.layers.encoder_layer_i
    with ln_1 / self_attention (FUSED in_proj qkv + out_proj) / ln_2 /
    mlp.{0,3} Linears. The classification head (heads.*) and the final
    encoder.ln are dropped (mmseg ViT final_norm=False — the taps feed
    the MultiLevelNeck unnormalized). Position embeddings port at the
    stored 14x14 grid; the model resizes them at trace time for other
    input sizes (nn/backbones/vit.py).
    """
    params: dict = {"conv_proj": {"kernel": _conv(sd["conv_proj.weight"]),
                                  "bias": np.asarray(sd["conv_proj.bias"],
                                                     np.float32)},
                    "class_token": np.asarray(sd["class_token"],
                                              np.float32),
                    "pos_embedding": np.asarray(
                        sd["encoder.pos_embedding"], np.float32)}
    i = 0
    while f"encoder.layers.encoder_layer_{i}.ln_1.weight" in sd:
        pre = f"encoder.layers.encoder_layer_{i}"

        def lin(name):
            w = np.asarray(sd[f"{pre}.{name}.weight"], np.float32)
            b = np.asarray(sd[f"{pre}.{name}.bias"], np.float32)
            return {"kernel": np.ascontiguousarray(w.T), "bias": b}

        blk = {
            "ln1": {"scale": np.asarray(sd[f"{pre}.ln_1.weight"],
                                        np.float32),
                    "bias": np.asarray(sd[f"{pre}.ln_1.bias"],
                                       np.float32)},
            "ln2": {"scale": np.asarray(sd[f"{pre}.ln_2.weight"],
                                        np.float32),
                    "bias": np.asarray(sd[f"{pre}.ln_2.bias"],
                                       np.float32)},
            # torch MHA fused in_proj rows are [q; k; v] — transposed
            # they become the qkv Dense's output columns in the same
            # order the model's reshape splits them
            "qkv": {"kernel": np.ascontiguousarray(np.asarray(
                        sd[f"{pre}.self_attention.in_proj_weight"],
                        np.float32).T),
                    "bias": np.asarray(
                        sd[f"{pre}.self_attention.in_proj_bias"],
                        np.float32)},
            "proj": {"kernel": np.ascontiguousarray(np.asarray(
                         sd[f"{pre}.self_attention.out_proj.weight"],
                         np.float32).T),
                     "bias": np.asarray(
                         sd[f"{pre}.self_attention.out_proj.bias"],
                         np.float32)},
            "fc1": lin("mlp.0"),
            "fc2": lin("mlp.3"),
        }
        params[f"block{i}"] = blk
        i += 1
    if i == 0:
        raise ValueError("no encoder.layers.encoder_layer_* keys — not a "
                         "torchvision ViT state_dict")
    return params, {}


def convert_named(sd: dict):
    """Generic torch state_dict -> (params, batch_stats) trees for models
    whose torch module names mirror our flax module names (ConvNormAct
    children named `conv`/`bn`; standalone convs keep kernel+bias under the
    module name). Used by the full-model golden-parity tests and by any
    torch checkpoint exported with our naming."""
    params: dict = {}
    stats: dict = {}

    def ensure(tree, parts):
        node = tree
        for p in parts:
            node = node.setdefault(p, {})
        return node

    # any module carrying a running_mean is a BatchNorm, whatever its
    # name (e.g. bisenetv2.py's standalone 'ce_bn') — the `parent ==
    # "bn"` rule below only covers ConvNormAct children
    bn_parents = {tuple(k.split(".")[:-1]) for k in sd
                  if k.endswith(".running_mean")}

    for key, value in sd.items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        v = np.asarray(value, dtype=np.float32)
        parent = parts[-2] if len(parts) >= 2 else ""
        if parent == "bn" or tuple(parts[:-1]) in bn_parents:
            if leaf in ("weight", "bias"):
                node = ensure(params, parts[:-1])
                node["scale" if leaf == "weight" else "bias"] = v
            else:  # running_mean / running_var
                node = ensure(stats, parts[:-1])
                node["mean" if leaf == "running_mean" else "var"] = v
        elif parent == "conv" and leaf == "weight":
            ensure(params, parts[:-1])["kernel"] = _conv(v)
        else:
            # standalone module, dispatched on weight rank:
            #   4-D = conv (OIHW -> HWIO), 2-D = nn.Linear ([out,in] ->
            #   flax Dense kernel [in,out]), 1-D = LayerNorm (-> scale).
            # Bare nn.Parameters with their own names (e.g. segmenter's
            # cls_emb) map to the same-named flax param verbatim.
            node = ensure(params, parts[:-1])
            if leaf == "weight":
                if v.ndim == 4:
                    node["kernel"] = _conv(v)
                elif v.ndim == 2:
                    node["kernel"] = np.ascontiguousarray(v.T)
                else:
                    node["scale"] = v
            elif leaf == "bias":
                node["bias"] = v
            else:
                node[leaf] = v
    return params, stats


def convert_hf_segformer(sd: dict):
    """HuggingFace `transformers` Segformer state_dict -> (params,
    batch_stats) trees in this framework's SegFormer naming
    (models/segformer.py). Accepts both `SegformerModel` (MiT encoder
    only — e.g. the nvidia/mit-b0..b5 ImageNet checkpoints; yields the
    `backbone` subtree) and `SegformerForSemanticSegmentation`
    (encoder + all-MLP decode head, e.g. the ADE/Cityscapes-finetuned
    zoo; yields the full model tree incl. `fuse` conv+BN and
    `cls_conv`).

    Layout notes: HF's separate key/value Linears fuse into our `kv`
    Dense (k occupies output columns [0:dim] — segformer.py _Attention);
    HF concatenates decoder stages c4-first, matching our fuse slice
    order, so `linear_fuse.weight` ports as-is; the torch checkpoint's
    NCHW convs transpose OIHW->HWIO (depthwise (C,1,3,3)->(3,3,1,C))."""
    sd = {k[len("segformer."):] if k.startswith("segformer.") else k:
          np.asarray(v) for k, v in sd.items()}
    params: dict = {"backbone": {}}
    stats: dict = {}
    bb = params["backbone"]

    def dense(prefix):
        return {"kernel": np.ascontiguousarray(
                    np.asarray(sd[prefix + ".weight"], np.float32).T),
                "bias": np.asarray(sd[prefix + ".bias"], np.float32)}

    def ln(prefix):
        return {"scale": np.asarray(sd[prefix + ".weight"], np.float32),
                "bias": np.asarray(sd[prefix + ".bias"], np.float32)}

    def conv(prefix, bias=True):
        out = {"kernel": _conv(sd[prefix + ".weight"])}
        if bias:
            out["bias"] = np.asarray(sd[prefix + ".bias"], np.float32)
        return out

    n_stages = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("encoder.patch_embeddings."))
    for i in range(n_stages):
        pe = f"encoder.patch_embeddings.{i}"
        bb[f"patch_embed{i + 1}_proj"] = conv(pe + ".proj")
        bb[f"patch_embed{i + 1}_ln"] = ln(pe + ".layer_norm")
        bb[f"norm{i + 1}"] = ln(f"encoder.layer_norm.{i}")
        depth = 1 + max(int(k.split(".")[3]) for k in sd
                        if k.startswith(f"encoder.block.{i}."))
        for j in range(depth):
            b = f"encoder.block.{i}.{j}"
            attn = {"q": dense(b + ".attention.self.query"),
                    "proj": dense(b + ".attention.output.dense")}
            kw = dense(b + ".attention.self.key")
            vw = dense(b + ".attention.self.value")
            attn["kv"] = {
                "kernel": np.concatenate([kw["kernel"], vw["kernel"]], 1),
                "bias": np.concatenate([kw["bias"], vw["bias"]])}
            if b + ".attention.self.sr.weight" in sd:  # sr > 1 stages
                attn["sr"] = conv(b + ".attention.self.sr")
                attn["srln"] = ln(b + ".attention.self.layer_norm")
            bb[f"block{i + 1}_{j}"] = {
                "ln1": ln(b + ".layer_norm_1"),
                "ln2": ln(b + ".layer_norm_2"),
                "attn": attn,
                "ffn": {"fc1": dense(b + ".mlp.dense1"),
                        "dwconv": conv(b + ".mlp.dwconv.dwconv"),
                        "fc2": dense(b + ".mlp.dense2")},
            }

    if "decode_head.linear_fuse.weight" in sd:
        for i in range(n_stages):
            params[f"linear_c{i + 1}"] = dense(
                f"decode_head.linear_c.{i}.proj")
        params["fuse"] = {
            "conv": {"kernel": _conv(sd["decode_head.linear_fuse.weight"])},
            "bn": {"scale": np.asarray(
                       sd["decode_head.batch_norm.weight"], np.float32),
                   "bias": np.asarray(
                       sd["decode_head.batch_norm.bias"], np.float32)}}
        stats["fuse"] = {"bn": {
            "mean": np.asarray(
                sd["decode_head.batch_norm.running_mean"], np.float32),
            "var": np.asarray(
                sd["decode_head.batch_norm.running_var"], np.float32)}}
        params["cls_conv"] = conv("decode_head.classifier")
    return params, stats


def load_pretrained_segformer(model_params, model_stats, path_or_sd,
                              backbone_only=False):
    """Merge a HuggingFace Segformer checkpoint into a SegFormer model's
    trees. The MiT backbone always ports; the decode head ports when the
    checkpoint has one (SegformerForSemanticSegmentation); the classifier
    ports only when its class count matches the model (a zoo checkpoint
    finetuned on a different label set keeps the model's fresh head).
    backbone_only=True ports just the MiT encoder — for models that embed
    it under a different head (UPerNet encoder='mit')."""
    import copy

    if isinstance(path_or_sd, (str, bytes)):
        import torch
        sd = torch.load(path_or_sd, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = {k: np.asarray(v) for k, v in path_or_sd.items()}
    hp, hs = convert_hf_segformer(sd)
    if backbone_only:
        hp = {"backbone": hp["backbone"]}
        hs = {}

    params = copy.deepcopy(jax_to_py(model_params))
    stats = copy.deepcopy(jax_to_py(model_stats))
    if "cls_conv" in hp and (hp["cls_conv"]["kernel"].shape !=
                             tuple(params["cls_conv"]["kernel"].shape)):
        print(f"note: checkpoint classifier "
              f"{hp['cls_conv']['kernel'].shape[-1]} classes != model "
              f"{params['cls_conv']['kernel'].shape[-1]}; keeping the "
              "model's fresh cls_conv")
        del hp["cls_conv"]
    _merge_checked(params["backbone"], hp.pop("backbone"), "params.backbone")
    for key, sub in hp.items():
        _merge_checked(params[key], sub, f"params.{key}")
    for key, sub in hs.items():
        _merge_checked(stats[key], sub, f"stats.{key}")
    return params, stats


def load_pretrained_backbone(model_params, model_stats, path_or_sd,
                             arch: str, backbone_key: str = "backbone"):
    """Merge converted torchvision weights into a model's trees (in place on
    copies; returns new (params, batch_stats)). Shapes are validated against
    the existing tree."""
    import copy

    if isinstance(path_or_sd, (str, bytes)):
        import torch
        sd = torch.load(path_or_sd, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = {k: np.asarray(v) for k, v in path_or_sd.items()}

    if arch == "mobilenetv2":
        bp, bs = convert_mobilenetv2(sd)
    elif arch in ("resnet50", "resnet"):
        bp, bs = convert_resnet(sd)
    elif arch == "resnet34":
        # basic blocks: conv1/conv2 only (convert_resnet skips absent conv3)
        bp, bs = convert_resnet(sd, layers=(3, 4, 6, 3))
    elif arch == "convnext":
        bp, bs = convert_convnext(sd)
    elif arch == "swin":
        bp, bs = convert_swin(sd)
    elif arch == "mobilenetv3":
        bp, bs = convert_mobilenetv3(sd)
    elif arch == "vit":
        bp, bs = convert_vit(sd)
    else:
        raise ValueError(f"unknown arch {arch!r}")

    params = copy.deepcopy(jax_to_py(model_params))
    stats = copy.deepcopy(jax_to_py(model_stats))
    _merge_checked(params[backbone_key], bp, f"params.{backbone_key}")
    if bs:  # ConvNeXt is all-LayerNorm: no backbone batch stats
        _merge_checked(stats[backbone_key], bs, f"stats.{backbone_key}")
    return params, stats


def jax_to_py(tree):
    import jax
    return jax.tree.map(np.asarray, dict(tree))


def _conv_inv(k) -> np.ndarray:
    """JAX HWIO (incl. depthwise (kh,kw,1,C)) -> torch OIHW / (C,1,kh,kw)."""
    return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1))
                                ).astype(np.float32)


def export_torch_state_dict(params, batch_stats) -> dict:
    """Inverse of `convert_named`: flax param/batch-stat trees -> a flat
    torch-style state_dict of numpy arrays (migration path back to torch —
    the reference framework loads `torch.load(w)['model']`, test.py:103).

    Naming is the mirrored-module convention `convert_named` consumes
    (ConvNormAct children `conv`/`bn`; standalone convs keep weight/bias):
    conv kernels transpose HWIO -> OIHW (depthwise (kh,kw,1,C) -> (C,1,kh,kw)),
    bn scale/bias/mean/var -> weight/bias/running_mean/running_var, plus the
    int64 `num_batches_tracked` torch BN modules require for a strict load.
    Round-trip `convert_named(export_torch_state_dict(p, s)) == (p, s)` is
    test-enforced (tests/test_port_torch.py)."""
    sd: dict = {}

    def walk_params(node, prefix):
        for k, v in node.items():
            path = f"{prefix}.{k}" if prefix else str(k)
            if isinstance(v, dict):
                walk_params(v, path)
                continue
            v = np.asarray(v, np.float32)
            parts = path.split(".")
            leaf, parent = parts[-1], parts[-2] if len(parts) >= 2 else ""
            base = ".".join(parts[:-1])
            if parent == "bn" and leaf in ("scale", "bias"):
                sd[f"{base}.{'weight' if leaf == 'scale' else 'bias'}"] = v
            elif leaf == "kernel":
                sd[f"{base}.weight"] = _conv_inv(v)
            elif leaf == "bias":
                sd[f"{base}.bias"] = v
            else:
                raise ValueError(f"unexported param leaf {path!r} — only "
                                 "conv kernel/bias and bn scale/bias trees "
                                 "are torch-exportable")

    def walk_stats(node, prefix):
        for k, v in node.items():
            path = f"{prefix}.{k}" if prefix else str(k)
            if isinstance(v, dict):
                walk_stats(v, path)
                continue
            v = np.asarray(v, np.float32)
            parts = path.split(".")
            leaf = parts[-1]
            base = ".".join(parts[:-1])
            if leaf in ("mean", "var"):
                sd[f"{base}.running_{leaf}"] = v
                sd.setdefault(f"{base}.num_batches_tracked",
                              np.zeros((), np.int64))
            else:
                raise ValueError(f"unexported batch-stat leaf {path!r}")

    walk_params(jax_to_py(params), "")
    walk_stats(jax_to_py(batch_stats), "")
    return sd


def save_torch_checkpoint(path: str, params, batch_stats):
    """Write a torch-loadable checkpoint `{'model': state_dict}` — the
    reference's checkpoint format (ckpt['model'], test.py:103-104)."""
    import torch
    # np.array copies: jax-backed arrays are non-writable views and
    # torch.from_numpy warns on (and forbids writing through) those
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in export_torch_state_dict(params, batch_stats).items()}
    torch.save({"model": sd}, path)
    return path


def _merge_checked(dst: dict, src: dict, path: str):
    for k, v in src.items():
        if k not in dst:
            raise KeyError(f"{path}.{k} not in model tree "
                           f"(has {sorted(dst.keys())})")
        if isinstance(v, dict):
            _merge_checked(dst[k], v, f"{path}.{k}")
        else:
            if tuple(dst[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"{path}.{k}: shape {v.shape} vs model {dst[k].shape}")
            dst[k] = v.astype(dst[k].dtype)
