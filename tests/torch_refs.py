"""Torch reconstructions of the reference models for golden parity tests.

The reference (/root/reference) depends on the unavailable `pytorch_modules`
package for ConvNormAct and the MobileNetV2/ResNet backbones; these are
rebuilt here from the documented contracts (SURVEY.md §2.9) so the full
reference forward pass can be executed in torch and compared numerically
against the flax models with ported weights:

  - TConvNormAct  == pytorch_modules.nn.ConvNormAct (Conv2d bias=False +
    BatchNorm2d(momentum 0.1) + activation; padding = dilation*(k-1)//2)
  - TMobileNetV2 / TResNet use torchvision state_dict naming so they also
    exercise utils/port_torch.convert_mobilenetv2 / convert_resnet (the
    production import path for real torchvision zoo weights).
  - TUNet / TDeepLabV3Plus / TASPP / THRNet reproduce the reference forward
    math (models/unet.py:27-56, models/deeplabv3plus.py:27-43,
    models/aspp.py:8-37, models/hrnet.py:27-406); decoder/stage module names
    mirror the flax module names so utils/port_torch.convert_named maps the
    weights 1:1.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TConvNormAct(nn.Module):
    def __init__(self, cin, cout, k=3, stride=1, dilation=1, groups=1,
                 activate="relu"):
        super().__init__()
        pad = dilation * (k - 1) // 2
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=pad,
                              dilation=dilation, groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(cout, momentum=0.1, eps=1e-5)
        self.activate = activate

    def forward(self, x):
        x = self.bn(self.conv(x))
        if self.activate == "relu":
            return F.relu(x)
        if self.activate == "relu6":
            return F.relu6(x)
        if self.activate == "gelu":
            return F.gelu(x)  # exact (erf), like jax approximate=False
        return x


class TSeparableConvNormAct(nn.Module):
    """pytorch_modules.nn.SeparableConvNormAct mirror (nn/blocks.py):
    depthwise kxk CNA + pointwise 1x1 CNA, children named depthwise /
    pointwise to match the flax tree."""

    def __init__(self, cin, cout, k=3, stride=1, dilation=1):
        super().__init__()
        self.depthwise = TConvNormAct(cin, cin, k, stride=stride,
                                      dilation=dilation, groups=cin)
        self.pointwise = TConvNormAct(cin, cout, 1)

    def forward(self, x):
        return self.pointwise(self.depthwise(x))


def randomize_bn_stats(model, seed=0):
    """Give every BN non-trivial affine params + running stats so eval-mode
    parity actually tests the BN math (fresh BNs are identity)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(0.5 + torch.rand(m.weight.shape, generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(
                    0.1 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(
                    0.5 + torch.rand(m.running_var.shape, generator=g))
        elif isinstance(m, (nn.LayerNorm, nn.GroupNorm)):
            # non-trivial LN/GN affines (fresh ones are weight=1/bias=0,
            # which would hide scale<->bias mapping bugs in the weight port)
            with torch.no_grad():
                m.weight.copy_(0.5 + torch.rand(m.weight.shape, generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))


# ---------------------------------------------------------------------------
# MobileNetV2 (torchvision features.* naming; 5 taps @ strides 2/4/8/16/32)
# ---------------------------------------------------------------------------

class _InvertedResidual(nn.Module):
    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = cin * expand
        self.use_res = stride == 1 and cin == cout
        layers = []
        if expand != 1:
            layers.append(nn.Sequential(
                nn.Conv2d(cin, hidden, 1, bias=False),
                nn.BatchNorm2d(hidden), nn.ReLU6(inplace=True)))
        layers.append(nn.Sequential(
            nn.Conv2d(hidden, hidden, 3, stride=stride, padding=1,
                      groups=hidden, bias=False),
            nn.BatchNorm2d(hidden), nn.ReLU6(inplace=True)))
        layers.append(nn.Conv2d(hidden, cout, 1, bias=False))
        layers.append(nn.BatchNorm2d(cout))
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


_MBV2_CFG = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
             (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


class TMobileNetV2(nn.Module):
    """Returns (x1, x2, x3, x4, x): 16/24/32/96/1280 ch (SURVEY.md §2.9)."""

    def __init__(self):
        super().__init__()
        feats = [nn.Sequential(nn.Conv2d(3, 32, 3, stride=2, padding=1,
                                         bias=False),
                               nn.BatchNorm2d(32), nn.ReLU6(inplace=True))]
        cin = 32
        for t, c, n, s in _MBV2_CFG:
            for i in range(n):
                feats.append(_InvertedResidual(cin, c, s if i == 0 else 1, t))
                cin = c
        feats.append(nn.Sequential(nn.Conv2d(cin, 1280, 1, bias=False),
                                   nn.BatchNorm2d(1280),
                                   nn.ReLU6(inplace=True)))
        self.features = nn.Sequential(*feats)
        # tap positions: end of cfg stages 0/1/2/4 + head
        self._taps = (1, 3, 6, 13, 18)

    def forward(self, x):
        taps = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self._taps:
                taps.append(x)
        return tuple(taps)


# ---------------------------------------------------------------------------
# ResNet (torchvision naming + v1.5 stride-on-3x3 + dilation semantics)
# ---------------------------------------------------------------------------

class _TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, width, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        self.downsample = downsample

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        res = x if self.downsample is None else self.downsample(x)
        return F.relu(out + res)


class _TorchBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, width, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.downsample = downsample

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        res = x if self.downsample is None else self.downsample(x)
        return F.relu(out + res)


class TResNet(nn.Module):
    """Feature-list ResNet matching torchvision naming/semantics: returns
    [stem(after relu, pre-maxpool), layer1..layer4]. The first block of a
    dilated stage keeps the PREVIOUS dilation (torchvision _make_layer)."""

    def __init__(self, block, layers,
                 replace_stride_with_dilation=(False, False, False)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self._dilation = 1
        self._cin = 64
        widths = (64, 128, 256, 512)
        for i, (w, n) in enumerate(zip(widths, layers)):
            stride = 1 if i == 0 else 2
            dilate = i > 0 and replace_stride_with_dilation[i - 1]
            setattr(self, f"layer{i + 1}",
                    self._make_layer(block, w, n, stride, dilate))

    def _make_layer(self, block, width, n, stride, dilate):
        prev_dilation = self._dilation
        if dilate:
            self._dilation *= stride
            stride = 1
        downsample = None
        if stride != 1 or self._cin != width * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self._cin, width * block.expansion, 1,
                          stride=stride, bias=False),
                nn.BatchNorm2d(width * block.expansion))
        blocks = [block(self._cin, width, stride, prev_dilation, downsample)]
        self._cin = width * block.expansion
        for _ in range(1, n):
            blocks.append(block(self._cin, width, 1, self._dilation))
        return nn.Sequential(*blocks)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        feats = [x]
        x = self.maxpool(x)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# reference models (decoder math from /root/reference/models/*.py)
# ---------------------------------------------------------------------------

def _up(x, scale, align=True):
    return F.interpolate(x, scale_factor=scale, mode="bilinear",
                         align_corners=align)


class TUNet(nn.Module):
    """models/unet.py:13-56: 3 up-convs with x2 ups + skip concat, 3x3 cls
    conv at 88ch between the last two x2 upsamples."""

    def __init__(self, num_classes):
        super().__init__()
        self.backbone = TMobileNetV2()
        self.up_conv0 = TConvNormAct(1280, 256)
        self.up_conv1 = TConvNormAct(352, 128)
        self.up_conv2 = TConvNormAct(160, 64)
        self.cls_conv = nn.Conv2d(88, num_classes, 3, padding=1)

    def forward(self, x):
        x1, x2, x3, x4, x = self.backbone(x)
        x = _up(self.up_conv0(x), 2)
        x = self.up_conv1(torch.cat([x, x4], 1))
        x = _up(x, 2)
        x = self.up_conv2(torch.cat([x, x3], 1))
        x = _up(x, 2)
        x = _up(torch.cat([x, x2], 1), 2)
        return _up(self.cls_conv(x), 2)


class TASPPPooling(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.gap_conv = TConvNormAct(cin, cout, 1)

    def forward(self, x):
        y = self.gap_conv(F.adaptive_avg_pool2d(x, 1))
        return F.interpolate(y, size=x.shape[-2:], mode="bilinear",
                             align_corners=False)


class TASPP(nn.Module):
    def __init__(self, cin, cout, rates):
        super().__init__()
        self.pool = TASPPPooling(cin, cout)
        self.conv1x1 = TConvNormAct(cin, cout, 1)
        for i, r in enumerate(rates):
            setattr(self, f"atrous{i}", TConvNormAct(cin, cout, 3, dilation=r))
        self.n_rates = len(rates)
        self.project = TConvNormAct(cout * (2 + len(rates)), cout, 1)

    def forward(self, x):
        ys = [self.pool(x), self.conv1x1(x)]
        ys += [getattr(self, f"atrous{i}")(x) for i in range(self.n_rates)]
        return self.project(torch.cat(ys, 1))


class TDeepLabV3Plus(nn.Module):
    """models/deeplabv3plus.py:14-44."""

    def __init__(self, num_classes, layers=(3, 4, 6, 3)):
        super().__init__()
        self.backbone = TResNet(_TorchBottleneck, layers,
                                replace_stride_with_dilation=(False, False,
                                                              True))
        self.project = TConvNormAct(256, 128, 1)
        self.aspp = TASPP(2048, 256, (6, 12, 18))
        self.cls_conv = nn.Conv2d(384, num_classes, 3, padding=1)

    def forward(self, x):
        feats = self.backbone(x)
        low = self.project(feats[1])
        y = _up(self.aspp(feats[-1]), 4)
        y = self.cls_conv(torch.cat([y, low], 1))
        return _up(y, 4)


class TBottleneckCNA(nn.Module):
    """HRNet-style bottleneck expressed with ConvNormAct children (names
    conv1/conv2/conv3/downsample match the flax tree)."""

    def __init__(self, cin, width, stride=1, downsample=False):
        super().__init__()
        self.conv1 = TConvNormAct(cin, width, 1)
        self.conv2 = TConvNormAct(width, width, 3, stride=stride)
        self.conv3 = TConvNormAct(width, width * 4, 1, activate=None)
        self.downsample = (TConvNormAct(cin, width * 4, 1, stride=stride,
                                        activate=None) if downsample else None)

    def forward(self, x):
        y = self.conv3(self.conv2(self.conv1(x)))
        res = x if self.downsample is None else self.downsample(x)
        return F.relu(y + res)


class TBasicBlockCNA(nn.Module):
    def __init__(self, cin, width, stride=1, downsample=False):
        super().__init__()
        self.conv1 = TConvNormAct(cin, width, 3, stride=stride)
        self.conv2 = TConvNormAct(width, width, 3, activate=None)
        self.downsample = (TConvNormAct(cin, width, 1, stride=stride,
                                        activate=None) if downsample else None)

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        res = x if self.downsample is None else self.downsample(x)
        return F.relu(y + res)


class THRModule(nn.Module):
    """models/hrnet.py:106-252: per-branch BasicBlock x4 + all-to-all fuse
    (j>i: 1x1 + bilinear x2^(j-i) align_corners=False; j<i: strided 3x3
    chain, last activation-free)."""

    def __init__(self, in_channels, channels, multi_scale_output=True):
        super().__init__()
        self.nb = len(channels)
        self.channels = channels
        self.multi_scale_output = multi_scale_output
        for i, (cin, c) in enumerate(zip(in_channels, channels)):
            for b in range(4):
                setattr(self, f"branch{i}_block{b}",
                        TBasicBlockCNA(cin if b == 0 else c, c,
                                       downsample=(b == 0 and cin != c)))
        num_out = self.nb if multi_scale_output else 1
        for i in range(num_out):
            for j in range(self.nb):
                if j > i:
                    setattr(self, f"fuse{i}_{j}",
                            TConvNormAct(channels[j], channels[i], 1))
                elif j < i:
                    for k in range(i - j):
                        last = k == i - j - 1
                        setattr(self, f"fuse{i}_{j}_down{k}",
                                TConvNormAct(
                                    channels[j],
                                    channels[i] if last else channels[j],
                                    3, stride=2,
                                    activate=None if last else "relu"))

    def forward(self, xs):
        ys = []
        for i in range(self.nb):
            y = xs[i]
            for b in range(4):
                y = getattr(self, f"branch{i}_block{b}")(y)
            ys.append(y)
        num_out = self.nb if self.multi_scale_output else 1
        fused = []
        for i in range(num_out):
            acc = None
            for j in range(self.nb):
                if j == i:
                    z = ys[j]
                elif j > i:
                    z = _up(getattr(self, f"fuse{i}_{j}")(ys[j]),
                            2 ** (j - i), align=False)
                else:
                    z = ys[j]
                    for k in range(i - j):
                        z = getattr(self, f"fuse{i}_{j}_down{k}")(z)
                acc = z if acc is None else acc + z
            fused.append(F.relu(acc))
        return fused


class THRNet(nn.Module):
    """models/hrnet.py:255-406 with num_branches_list=[2,3,4], width 32.
    feature_output=True mirrors the flax HRNetV2 backbone mode: the last
    stage keeps every branch, forward returns the upsampled concat and no
    classifier params are created (models/hrnet.py feature_output)."""

    def __init__(self, num_classes, num_branches_list=(2, 3, 4), base=32,
                 feature_output=False):
        super().__init__()
        self.feature_output = feature_output
        self.stem_conv1 = TConvNormAct(3, 64, 3, stride=2, activate=None)
        self.stem_conv2 = TConvNormAct(64, 64, 3, stride=2)
        for b in range(4):
            setattr(self, f"stem_bottleneck{b}",
                    TBottleneckCNA(256 if b else 64, 64, downsample=(b == 0)))
        self.num_branches_list = num_branches_list
        prev = [256]
        for s, nb in enumerate(num_branches_list):
            cur = [base * (2 ** i) for i in range(nb)]
            for i in range(nb):
                if i < len(prev):
                    if prev[i] != cur[i]:
                        setattr(self, f"transition{s}_{i}",
                                TConvNormAct(prev[i], cur[i], 3))
                else:
                    cin = prev[-1]
                    for j in range(i + 1 - len(prev)):
                        out = cur[i] if j == i - len(prev) else prev[-1]
                        setattr(self, f"transition{s}_{i}_down{j}",
                                TConvNormAct(cin, out, 3, stride=2))
                        cin = out
            last = s == len(num_branches_list) - 1
            setattr(self, f"stage{s}",
                    THRModule(cur, cur,
                              multi_scale_output=(feature_output
                                                  or not last)))
            prev = cur
        if not feature_output:
            self.final_layer = nn.Conv2d(prev[0], num_classes, 1)

    def forward(self, x):
        x = self.stem_conv2(self.stem_conv1(x))
        for b in range(4):
            x = getattr(self, f"stem_bottleneck{b}")(x)
        ys = [x]
        prev_n = 1
        for s, nb in enumerate(self.num_branches_list):
            xs = []
            for i in range(nb):
                if i < prev_n:
                    t = getattr(self, f"transition{s}_{i}", None)
                    xs.append(ys[i] if t is None else t(ys[i]))
                else:
                    z = ys[-1]
                    for j in range(i + 1 - prev_n):
                        z = getattr(self, f"transition{s}_{i}_down{j}")(z)
                    xs.append(z)
            ys = getattr(self, f"stage{s}")(xs)
            prev_n = nb
        if self.feature_output:
            outs = [ys[0]] + [_up(y, 2 ** (i + 1), align=False)
                              for i, y in enumerate(ys[1:])]
            return torch.cat(outs, dim=1)
        return _up(self.final_layer(ys[0]), 4, align=False)


class TPSPNet(nn.Module):
    """PSPNet mirror (models/pspnet.py — an addition beyond the reference;
    classic Zhao et al. pyramid pooling). ResNet-50 at output-stride 8,
    bins (1,2,3,6) adaptive-avg-pooled -> 1x1 CNA 2048->512 -> bilinear
    upsample (align_corners=True) -> concat -> 3x3 CNA 4096->512 -> 1x1
    cls conv -> x8 upsample. Names mirror the flax tree (convert_named)."""

    def __init__(self, num_classes, layers=(3, 4, 6, 3), bins=(1, 2, 3, 6),
                 jpu=False):
        super().__init__()
        dil = (False, False, False) if jpu else (False, True, True)
        self.backbone = TResNet(_TorchBottleneck, layers,
                                replace_stride_with_dilation=dil)
        self.jpu = jpu
        if jpu:  # FastFCN joint pyramid upsampling (models/pspnet.py)
            chans = {2: 512, 3: 1024, 4: 2048}
            for i, c in chans.items():
                setattr(self, f"jpu_conv{i}", TConvNormAct(c, 512, 3))
            for d in (1, 2, 4, 8):
                setattr(self, f"jpu_dil{d}",
                        TSeparableConvNormAct(1536, 512, 3, dilation=d))
        self.bins = bins
        for b in bins:
            setattr(self, f"ppm_conv{b}", TConvNormAct(2048, 512, 1))
        self.head = TConvNormAct(2048 + 512 * len(bins), 512, 3)
        self.cls_conv = nn.Conv2d(512, num_classes, 1)

    def forward(self, x):
        feats = self.backbone(x)
        if self.jpu:
            taps = [getattr(self, f"jpu_conv{i}")(feats[i])
                    for i in (2, 3, 4)]
            size = taps[0].shape[-2:]
            taps = [taps[0]] + [
                F.interpolate(t, size=size, mode="bilinear",
                              align_corners=True) for t in taps[1:]]
            cat = torch.cat(taps, 1)
            y = torch.cat([getattr(self, f"jpu_dil{d}")(cat)
                           for d in (1, 2, 4, 8)], 1)
        else:
            y = feats[-1]
        size = y.shape[-2:]
        branches = [y]
        for b in self.bins:
            p = F.adaptive_avg_pool2d(y, b)
            p = getattr(self, f"ppm_conv{b}")(p)
            branches.append(F.interpolate(p, size=size, mode="bilinear",
                                          align_corners=True))
        y = self.head(torch.cat(branches, 1))
        return _up(self.cls_conv(y), 8)


class TDANet(nn.Module):
    """DANet mirror (models/danet.py — an addition beyond the reference;
    Fu et al. CVPR'19 dual attention, mmseg DAHead math). Dilated os=8
    ResNet-50 -> two 3x3 CNA 2048->512 branch entries; PAM (1x1 q/k to
    64, 1x1 v to 512, softmax position attention, zero-ish scalar gate)
    and CAM (channel attention with the paper's rowmax-minus-energy
    softmax, scalar gate); 3x3 CNA branch exits, summed -> 1x1 cls ->
    x8 (align=False). Gammas init 0.5 (not the paper's 0) so the parity
    test actually exercises the attention math — at 0 a broken attention
    path would still "pass". Names mirror the flax tree
    (convert_named)."""

    def __init__(self, num_classes, layers=(3, 4, 6, 3), channels=512):
        super().__init__()
        self.backbone = TResNet(
            _TorchBottleneck, layers,
            replace_stride_with_dilation=(False, True, True))
        ch = channels
        self.pam_in = TConvNormAct(2048, ch, 3)
        self.pam_query = nn.Conv2d(ch, ch // 8, 1)
        self.pam_key = nn.Conv2d(ch, ch // 8, 1)
        self.pam_value = nn.Conv2d(ch, ch, 1)
        self.pam_gamma = _TLayerScale(1, 0.5)
        self.pam_out = TConvNormAct(ch, ch, 3)
        self.cam_in = TConvNormAct(2048, ch, 3)
        self.cam_gamma = _TLayerScale(1, 0.5)
        self.cam_out = TConvNormAct(ch, ch, 3)
        self.cls_conv = nn.Conv2d(ch, num_classes, 1)

    def forward(self, x):
        y = self.backbone(x)[-1]
        p = self.pam_in(y)
        bsz, ch, h, w = p.shape
        n = h * w
        q = self.pam_query(p).view(bsz, -1, n).permute(0, 2, 1)
        k = self.pam_key(p).view(bsz, -1, n)
        attn = torch.softmax(torch.bmm(q, k), dim=-1)  # [B, N, N]
        v = self.pam_value(p).view(bsz, -1, n)
        out = torch.bmm(v, attn.permute(0, 2, 1)).view(bsz, ch, h, w)
        p = self.pam_out(self.pam_gamma(out) + p)

        c = self.cam_in(y)
        proj = c.view(bsz, ch, n)
        energy = torch.bmm(proj, proj.transpose(1, 2))  # [B, C, C]
        energy = (energy.max(-1, keepdim=True)[0].expand_as(energy)
                  - energy)
        cattn = torch.softmax(energy, dim=-1)
        out = torch.bmm(cattn, proj).view(bsz, ch, h, w)
        c = self.cam_out(self.cam_gamma(out) + c)
        return _up(self.cls_conv(p + c), 8, align=False)


class TFPN(nn.Module):
    """Semantic-FPN mirror (models/fpn.py — an addition beyond the
    reference; Kirillov et al. Panoptic-FPN semantic branch with BN in
    place of GN, per the framework's block idiom). ResNet C2..C5 -> 1x1
    lateral CNA (no act) to 256 -> top-down nearest + add -> 3x3 smooth
    CNA -> per-level head stages (3x3 CNA 128 -> x2 bilinear align=False)
    to stride 4 -> sum -> 1x1 cls conv -> x4 upsample (align=False).
    Names mirror the flax tree (convert_named)."""

    def __init__(self, num_classes, layers=(3, 4, 6, 3), block=None,
                 fpn_channels=256, seg_channels=128):
        super().__init__()
        block = block or _TorchBottleneck
        self.backbone = TResNet(block, layers)
        chans = [64 * block.expansion * (2 ** i) for i in range(4)]
        for i in range(4):
            setattr(self, f"lat{i}",
                    TConvNormAct(chans[i], fpn_channels, 1, activate=None))
            setattr(self, f"smooth{i}",
                    TConvNormAct(fpn_channels, fpn_channels, 3))
        self.head0_0 = TConvNormAct(fpn_channels, seg_channels, 3)
        for i in (1, 2, 3):
            for j in range(i):
                setattr(self, f"head{i}_{j}",
                        TConvNormAct(fpn_channels if j == 0 else seg_channels,
                                     seg_channels, 3))
        self.cls_conv = nn.Conv2d(seg_channels, num_classes, 1)

    def forward(self, x):
        feats = self.backbone(x)[1:]  # C2..C5
        sizes = [f.shape[-2:] for f in feats]
        p = self.lat3(feats[3])
        pyramid = [p]
        for i in (2, 1, 0):
            lat = getattr(self, f"lat{i}")(feats[i])
            p = lat + F.interpolate(p, size=sizes[i], mode="nearest")
            pyramid.insert(0, p)
        pyramid = [getattr(self, f"smooth{i}")(p)
                   for i, p in enumerate(pyramid)]
        y = self.head0_0(pyramid[0])
        for i in (1, 2, 3):
            z = pyramid[i]
            for j in range(i):
                z = getattr(self, f"head{i}_{j}")(z)
                z = F.interpolate(z, size=sizes[i - 1 - j], mode="bilinear",
                                  align_corners=False)
            y = y + z
        return _up(self.cls_conv(y), 4, align=False)


class TSegAttn(nn.Module):
    """SegFormer efficient self-attention mirror (models/segformer.py
    _Attention): K/V on a sr-strided conv reduction; child names q/kv/
    proj/sr/srln match the flax tree for convert_named."""

    def __init__(self, dim, heads, sr):
        super().__init__()
        self.heads, self.sr_ratio = heads, sr
        self.q = nn.Linear(dim, dim)
        self.kv = nn.Linear(dim, 2 * dim)
        self.proj = nn.Linear(dim, dim)
        if sr > 1:
            self.sr = nn.Conv2d(dim, dim, sr, stride=sr)
            self.srln = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, h, w):
        b, n, c = x.shape
        hd = c // self.heads
        q = self.q(x).reshape(b, n, self.heads, hd).permute(0, 2, 1, 3)
        if self.sr_ratio > 1:
            x_ = x.permute(0, 2, 1).reshape(b, c, h, w)
            x_ = self.sr(x_).reshape(b, c, -1).permute(0, 2, 1)
            x_ = self.srln(x_)
        else:
            x_ = x
        kv = self.kv(x_).reshape(b, -1, 2, self.heads, hd).permute(
            2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = ((q @ k.transpose(-2, -1)) * hd ** -0.5).softmax(-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(y)


class TMixFFN(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.dwconv = nn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, h, w):
        b, n, c = x.shape
        y = self.fc1(x)
        y = y.permute(0, 2, 1).reshape(b, -1, h, w)
        y = self.dwconv(y).flatten(2).transpose(1, 2)
        return self.fc2(F.gelu(y))


class TSegBlock(nn.Module):
    def __init__(self, dim, heads, sr, mlp_ratio=4):
        super().__init__()
        self.ln1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TSegAttn(dim, heads, sr)
        self.ln2 = nn.LayerNorm(dim, eps=1e-6)
        self.ffn = TMixFFN(dim, mlp_ratio * dim)

    def forward(self, x, h, w):
        x = x + self.attn(self.ln1(x), h, w)
        return x + self.ffn(self.ln2(x), h, w)


class TMiT(nn.Module):
    """Mix Transformer encoder mirror (models/segformer.py _MiT). Flat
    child names (patch_embed{i}_proj / patch_embed{i}_ln / block{i}_{j} /
    norm{i}) match the flax module names 1:1."""

    def __init__(self, embed_dims, depths, num_heads, sr_ratios=(8, 4, 2, 1)):
        super().__init__()
        self.depths = depths
        cin = 3
        for i, (dim, depth, heads) in enumerate(
                zip(embed_dims, depths, num_heads)):
            k, s = (7, 4) if i == 0 else (3, 2)
            setattr(self, f"patch_embed{i + 1}_proj",
                    nn.Conv2d(cin, dim, k, stride=s, padding=k // 2))
            setattr(self, f"patch_embed{i + 1}_ln",
                    nn.LayerNorm(dim, eps=1e-6))
            for j in range(depth):
                setattr(self, f"block{i + 1}_{j}",
                        TSegBlock(dim, heads, sr_ratios[i]))
            setattr(self, f"norm{i + 1}", nn.LayerNorm(dim, eps=1e-6))
            cin = dim

    def forward(self, x):
        feats = []
        for i, depth in enumerate(self.depths):
            x = getattr(self, f"patch_embed{i + 1}_proj")(x)
            b, c, h, w = x.shape
            x = x.flatten(2).transpose(1, 2)
            x = getattr(self, f"patch_embed{i + 1}_ln")(x)
            for j in range(depth):
                x = getattr(self, f"block{i + 1}_{j}")(x, h, w)
            x = getattr(self, f"norm{i + 1}")(x)
            x = x.transpose(1, 2).reshape(b, c, h, w)
            feats.append(x)
        return feats


class TSegFormer(nn.Module):
    """SegFormer mirror (models/segformer.py — an addition beyond the
    reference; Xie et al. NeurIPS'21). MiT encoder + all-MLP decoder:
    per-stage Linear to dec_dim, bilinear (align=False) to stride 4,
    concat c4..c1, 1x1 CNA fuse, 1x1 cls conv, upsample to input size."""

    VARIANTS = {  # keep in sync with models/segformer.SEGFORMER_VARIANTS
        "tiny": ((16, 32, 64, 128), (1, 1, 1, 1), (1, 2, 4, 8), 64),
        "b0": ((32, 64, 160, 256), (2, 2, 2, 2), (1, 2, 5, 8), 256),
    }

    def __init__(self, num_classes, variant="b0"):
        super().__init__()
        dims, depths, heads, dec = self.VARIANTS[variant]
        self.backbone = TMiT(dims, depths, heads)
        for i, d in enumerate(dims):
            setattr(self, f"linear_c{i + 1}", nn.Linear(d, dec))
        self.fuse = TConvNormAct(4 * dec, dec, 1)
        self.cls_conv = nn.Conv2d(dec, num_classes, 1)

    def forward(self, x):
        size = x.shape[-2:]
        feats = self.backbone(x)
        size4 = feats[0].shape[-2:]
        outs = []
        for i, f in enumerate(feats):
            y = getattr(self, f"linear_c{i + 1}")(
                f.flatten(2).transpose(1, 2))
            y = y.transpose(1, 2).reshape(f.shape[0], -1, *f.shape[-2:])
            if i > 0:
                y = F.interpolate(y, size=size4, mode="bilinear",
                                  align_corners=False)
            outs.append(y)
        y = self.fuse(torch.cat(outs[::-1], 1))
        y = self.cls_conv(y)
        return F.interpolate(y, size=size, mode="bilinear",
                             align_corners=False)


class TUPerNet(nn.Module):
    """UPerNet mirror (models/upernet.py — an addition beyond the
    reference; Xiao et al. unified perceptual parsing head, mmseg
    UPerHead conventions). PPM-capped C5 -> FPN with BN+ReLU laterals ->
    stride-4 concat fuse -> 1x1 cls conv -> x4 upsample, bilinear
    align_corners=False throughout. encoder='mit' swaps the ResNet
    pyramid for the Mix Transformer encoder (TMiT). Names mirror the
    flax tree (convert_named)."""

    def __init__(self, num_classes, layers=(3, 4, 6, 3), block=None,
                 encoder="resnet", mit_dims=(32, 64, 160, 256),
                 mit_depths=(2, 2, 2, 2), mit_heads=(1, 2, 5, 8),
                 cn_depths=(1, 1, 1, 1), cn_dims=(16, 32, 64, 128),
                 cn_layer_scale=1e-6,
                 channels=512, pool_scales=(1, 2, 3, 6)):
        super().__init__()
        self.encoder = encoder
        if encoder == "mit":
            self.backbone = TMiT(mit_dims, mit_depths, mit_heads)
            chans = list(mit_dims)
        elif encoder == "convnext":
            self.backbone = TConvNeXt(cn_depths, cn_dims,
                                      layer_scale=cn_layer_scale)
            chans = list(cn_dims)
        elif encoder == "swin":
            self.backbone = TSwin()  # pico config
            chans = [16 * (2 ** i) for i in range(4)]
        elif encoder == "vit":
            self.backbone = TViT()  # pico config (4 layers, dim 32)
            dim = 32
            chans = [dim] * 4
            # MultiLevelNeck (models/upernet.py encoder='vit'): 1x1
            # lateral -> bilinear rescale to strides 4/8/16/32 -> 3x3
            for i in range(4):
                setattr(self, f"neck_lat{i}", nn.Conv2d(dim, dim, 1))
                setattr(self, f"neck_conv{i}",
                        nn.Conv2d(dim, dim, 3, padding=1))
        else:
            block = block or _TorchBottleneck
            self.backbone = TResNet(block, layers)
            chans = [64 * block.expansion * (2 ** i) for i in range(4)]
        self.pool_scales = pool_scales
        for s in pool_scales:
            setattr(self, f"ppm_conv{s}",
                    TConvNormAct(chans[3], channels, 1))
        self.ppm_bottleneck = TConvNormAct(
            chans[3] + channels * len(pool_scales), channels, 3)
        for i in range(3):
            setattr(self, f"lat{i}", TConvNormAct(chans[i], channels, 1))
            setattr(self, f"fpn_conv{i}",
                    TConvNormAct(channels, channels, 3))
        self.fpn_bottleneck = TConvNormAct(4 * channels, channels, 3)
        self.cls_conv = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        feats = self.backbone(x)
        if self.encoder == "resnet":
            feats = feats[1:]  # C2..C5 (mit/convnext taps are already 4)
        elif self.encoder == "vit":
            necked = []
            for i, (t, s) in enumerate(zip(feats, (4, 2, 1, 0.5))):
                y = getattr(self, f"neck_lat{i}")(t)
                hw = (int(t.shape[-2] * s), int(t.shape[-1] * s))
                if s != 1:
                    y = F.interpolate(y, size=hw, mode="bilinear",
                                      align_corners=False)
                necked.append(getattr(self, f"neck_conv{i}")(y))
            feats = necked
        sizes = [f.shape[-2:] for f in feats]
        c5 = feats[3]
        branches = [c5]
        for s in self.pool_scales:
            p = getattr(self, f"ppm_conv{s}")(F.adaptive_avg_pool2d(c5, s))
            branches.append(F.interpolate(p, size=sizes[3], mode="bilinear",
                                          align_corners=False))
        top = self.ppm_bottleneck(torch.cat(branches, 1))
        laterals = [getattr(self, f"lat{i}")(feats[i])
                    for i in range(3)] + [top]
        for i in (2, 1, 0):
            laterals[i] = laterals[i] + F.interpolate(
                laterals[i + 1], size=sizes[i], mode="bilinear",
                align_corners=False)
        pyramid = [getattr(self, f"fpn_conv{i}")(laterals[i])
                   for i in range(3)] + [top]
        outs = [pyramid[0]] + [
            F.interpolate(p, size=sizes[0], mode="bilinear",
                          align_corners=False) for p in pyramid[1:]]
        y = self.fpn_bottleneck(torch.cat(outs, 1))
        return _up(self.cls_conv(y), 4, align=False)


class _TGELayer(nn.Module):
    """models/bisenetv2.py _GELayer: gather 3x3, depthwise expansion
    (e=6), 1x1 linear projection, (separable shortcut when strided),
    residual ReLU."""

    def __init__(self, cin, cout, stride=1, expand=6):
        super().__init__()
        mid = cin * expand
        self.stride = stride
        self.conv1 = TConvNormAct(cin, cin, 3)
        if stride == 1:
            self.dwconv = TConvNormAct(cin, mid, 3, groups=cin)
        else:
            self.dwconv1 = TConvNormAct(cin, mid, 3, stride=stride,
                                        groups=cin, activate=None)
            self.dwconv2 = TConvNormAct(mid, mid, 3, groups=mid)
            self.short_dw = TConvNormAct(cin, cin, 3, stride=stride,
                                         groups=cin, activate=None)
            self.short_pw = TConvNormAct(cin, cout, 1, activate=None)
        self.conv2 = TConvNormAct(mid, cout, 1, activate=None)

    def forward(self, x):
        y = self.conv1(x)
        if self.stride == 1:
            y = self.dwconv(y)
            identity = x
        else:
            y = self.dwconv2(self.dwconv1(y))
            identity = self.short_pw(self.short_dw(x))
        return F.relu(self.conv2(y) + identity)


class TBiSeNetV2(nn.Module):
    """models/bisenetv2.py: detail branch (64/64/128 @ s8), semantic
    branch (stem 16 @ s4, GE 32/64/128 to s32, context embedding),
    bilateral guided aggregation, 3x3x1024 head + 1x1 cls + x8 up."""

    def __init__(self, num_classes):
        super().__init__()
        c1, c2, c3 = 64, 64, 128
        s1, s3, s4, s5 = 16, 32, 64, 128
        self.detail1_0 = TConvNormAct(3, c1, 3, stride=2)
        self.detail1_1 = TConvNormAct(c1, c1, 3)
        self.detail2_0 = TConvNormAct(c1, c2, 3, stride=2)
        self.detail2_1 = TConvNormAct(c2, c2, 3)
        self.detail2_2 = TConvNormAct(c2, c2, 3)
        self.detail3_0 = TConvNormAct(c2, c3, 3, stride=2)
        self.detail3_1 = TConvNormAct(c3, c3, 3)
        self.detail3_2 = TConvNormAct(c3, c3, 3)

        self.stem_conv = TConvNormAct(3, s1, 3, stride=2)
        self.stem_left0 = TConvNormAct(s1, s1 // 2, 1)
        self.stem_left1 = TConvNormAct(s1 // 2, s1, 3, stride=2)
        self.stem_pool = nn.MaxPool2d(3, stride=2, padding=1)
        self.stem_fuse = TConvNormAct(2 * s1, s1, 3)
        self.ge3_0 = _TGELayer(s1, s3, stride=2)
        self.ge3_1 = _TGELayer(s3, s3)
        self.ge4_0 = _TGELayer(s3, s4, stride=2)
        self.ge4_1 = _TGELayer(s4, s4)
        self.ge5_0 = _TGELayer(s4, s5, stride=2)
        self.ge5_1 = _TGELayer(s5, s5)
        self.ge5_2 = _TGELayer(s5, s5)
        self.ge5_3 = _TGELayer(s5, s5)
        self.ce_bn = nn.BatchNorm2d(s5)
        self.ce_conv = TConvNormAct(s5, s5, 1)
        self.ce_fuse = TConvNormAct(s5, s5, 3)

        self.bga_d_dw = TConvNormAct(c3, c3, 3, groups=c3, activate=None)
        self.bga_d_pw = nn.Conv2d(c3, c3, 1, bias=False)
        self.bga_d_down = TConvNormAct(c3, c3, 3, stride=2, activate=None)
        self.bga_pool = nn.AvgPool2d(3, stride=2, padding=1)
        self.bga_s_conv = TConvNormAct(c3, c3, 3, activate=None)
        self.bga_s_dw = TConvNormAct(c3, c3, 3, groups=c3, activate=None)
        self.bga_s_pw = nn.Conv2d(c3, c3, 1, bias=False)
        self.bga_fuse = TConvNormAct(c3, c3, 3)

        self.head = TConvNormAct(c3, 1024, 3)
        self.cls_conv = nn.Conv2d(1024, num_classes, 1)

    def forward(self, x):
        d = self.detail1_1(self.detail1_0(x))
        d = self.detail2_2(self.detail2_1(self.detail2_0(d)))
        d = self.detail3_2(self.detail3_1(self.detail3_0(d)))

        s = self.stem_conv(x)
        a = self.stem_left1(self.stem_left0(s))
        b = self.stem_pool(s)
        s = self.stem_fuse(torch.cat([a, b], 1))
        s = self.ge3_1(self.ge3_0(s))
        s = self.ge4_1(self.ge4_0(s))
        s = self.ge5_3(self.ge5_2(self.ge5_1(self.ge5_0(s))))
        g = self.ce_conv(self.ce_bn(s.mean((2, 3), keepdim=True)))
        s = self.ce_fuse(s + g)

        d_a = self.bga_d_pw(self.bga_d_dw(d))
        d_b = self.bga_pool(self.bga_d_down(d))
        s_a = F.interpolate(self.bga_s_conv(s), size=d.shape[-2:],
                            mode="bilinear", align_corners=False)
        s_b = self.bga_s_pw(self.bga_s_dw(s))
        left = d_a * torch.sigmoid(s_a)
        right = F.interpolate(d_b * torch.sigmoid(s_b), size=d.shape[-2:],
                              mode="bilinear", align_corners=False)
        y = self.bga_fuse(left + right)
        return _up(self.cls_conv(self.head(y)), 8, align=False)


class TOCRNet(nn.Module):
    """models/ocrnet.py: HRNetV2 feature backbone + the mmseg OCR cascade
    (FCNHead soft regions -> spatial gather -> object attention -> fuse).
    Module names mirror the flax tree (convert_named); all math f32."""

    def __init__(self, num_classes, base=32, ocr_channels=512,
                 key_channels=256, num_branches_list=(2, 3, 4)):
        super().__init__()
        self.num_classes = num_classes
        self.key_channels = key_channels
        self.backbone = THRNet(1, num_branches_list=num_branches_list,
                               base=base, feature_output=True)
        cin = sum(base * (2 ** i) for i in range(num_branches_list[-1]))
        self.aux_conv = TConvNormAct(cin, cin, 1)
        self.aux_cls = nn.Conv2d(cin, num_classes, 1)
        self.bottleneck = TConvNormAct(cin, ocr_channels, 3)
        self.query0 = TConvNormAct(ocr_channels, key_channels, 1)
        self.query1 = TConvNormAct(key_channels, key_channels, 1)
        self.key0 = TConvNormAct(ocr_channels, key_channels, 1)
        self.key1 = TConvNormAct(key_channels, key_channels, 1)
        self.value = TConvNormAct(ocr_channels, key_channels, 1)
        self.out_project = TConvNormAct(key_channels, ocr_channels, 1)
        self.fuse = TConvNormAct(2 * ocr_channels, ocr_channels, 1)
        self.cls_conv = nn.Conv2d(ocr_channels, num_classes, 1)

    def forward(self, x):
        feats = self.backbone(x)
        aux = self.aux_cls(self.aux_conv(feats))          # [B, K, h, w]
        pix = self.bottleneck(feats)                      # [B, C, h, w]
        bsz, c, h, w = pix.shape
        k = self.num_classes
        probs = F.softmax(aux.reshape(bsz, k, h * w), dim=2)
        regions = torch.matmul(probs, pix.reshape(bsz, c, h * w)
                               .permute(0, 2, 1))         # [B, K, C]
        regions4 = regions.permute(0, 2, 1).reshape(bsz, c, k, 1)
        q = self.query1(self.query0(pix))
        kk = self.key1(self.key0(regions4))
        v = self.value(regions4)
        sim = torch.matmul(
            q.reshape(bsz, self.key_channels, h * w).permute(0, 2, 1),
            kk.reshape(bsz, self.key_channels, k))
        attn = F.softmax(sim * self.key_channels ** -0.5, dim=-1)
        ctx = torch.matmul(attn, v.reshape(bsz, self.key_channels, k)
                           .permute(0, 2, 1))             # [B, hw, 256]
        ctx = ctx.permute(0, 2, 1).reshape(bsz, self.key_channels, h, w)
        y = self.fuse(torch.cat([self.out_project(ctx), pix], dim=1))
        return _up(self.cls_conv(y), 4, align=False)


class _TPermute(nn.Module):
    """torchvision.ops.Permute stand-in (param-free, keeps block indices
    0..6 identical to torchvision CNBlock so state_dict keys match)."""

    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return x.permute(self.dims)


class _TLayerNorm2d(nn.LayerNorm):
    """torchvision LayerNorm2d: LayerNorm over C of an NCHW tensor."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class _TCNBlock(nn.Module):
    """torchvision CNBlock (stochastic depth omitted — eval parity)."""

    def __init__(self, dim, layer_scale=1e-6):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True),
            _TPermute([0, 2, 3, 1]),
            nn.LayerNorm(dim, eps=1e-6),
            nn.Linear(dim, 4 * dim),
            nn.GELU(),
            nn.Linear(4 * dim, dim),
            _TPermute([0, 3, 1, 2]),
        )
        self.layer_scale = nn.Parameter(
            torch.full((dim, 1, 1), layer_scale))

    def forward(self, x):
        return x + self.layer_scale * self.block(x)


class TConvNeXt(nn.Module):
    """torchvision convnext_* feature trunk with torchvision state_dict
    naming (`features.{0..7}`), so it exercises
    utils/port_torch.convert_convnext — the production import path for
    real torchvision zoo weights (like TMobileNetV2/TResNet above).
    Returns the 4 stage taps at strides 4/8/16/32 (NCHW)."""

    def __init__(self, depths=(1, 1, 1, 1), dims=(16, 32, 64, 128),
                 layer_scale=1e-6):
        super().__init__()
        feats = [nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4, bias=True),
            _TLayerNorm2d(dims[0], eps=1e-6))]
        self.tap_idx = []
        for s, (depth, dim) in enumerate(zip(depths, dims)):
            if s > 0:
                feats.append(nn.Sequential(
                    _TLayerNorm2d(dims[s - 1], eps=1e-6),
                    nn.Conv2d(dims[s - 1], dim, 2, stride=2, bias=True)))
            feats.append(nn.Sequential(
                *[_TCNBlock(dim, layer_scale) for _ in range(depth)]))
            self.tap_idx.append(len(feats) - 1)
        self.features = nn.Sequential(*feats)

    def forward(self, x):
        taps = []
        for i, mod in enumerate(self.features):
            x = mod(x)
            if i in self.tap_idx:
                taps.append(x)
        return taps


class _TShiftedWindowAttention(nn.Module):
    """torchvision ShiftedWindowAttention (v1): pad to window multiples,
    per-axis shift disable when the window covers the padded axis,
    relative position bias, 9-region mask over the padded canvas."""

    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window - 1) ** 2, heads))
        nn.init.trunc_normal_(self.relative_position_bias_table, std=0.02)
        coords = torch.stack(torch.meshgrid(
            torch.arange(window), torch.arange(window),
            indexing="ij")).flatten(1)
        rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0)
        rel = rel + (window - 1)
        rel[:, :, 0] *= 2 * window - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.heads, self.window, self.shift = heads, window, shift

    def forward(self, x):  # [B, H, W, C] (torchvision swin is NHWC)
        B, H, W, C = x.shape
        ws = self.window
        pad_r, pad_b = (ws - W % ws) % ws, (ws - H % ws) % ws
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        _, pH, pW, _ = x.shape
        sh = 0 if ws >= pH else self.shift
        sw = 0 if ws >= pW else self.shift
        if sh or sw:
            x = torch.roll(x, (-sh, -sw), dims=(1, 2))
        nh, nw = pH // ws, pW // ws
        n = ws * ws
        x = x.view(B, nh, ws, nw, ws, C).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(B * nh * nw, n, C)
        qkv = self.qkv(x).reshape(x.size(0), n, 3, self.heads,
                                  C // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (C // self.heads) ** -0.5, qkv[1], qkv[2]
        attn = q.matmul(k.transpose(-2, -1))
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if sh or sw:
            canvas = x.new_zeros((pH, pW))
            cnt = 0
            for h0, h1 in ((0, pH - ws), (pH - ws, pH - sh),
                           (pH - sh, pH)):
                for w0, w1 in ((0, pW - ws), (pW - ws, pW - sw),
                               (pW - sw, pW)):
                    canvas[h0:h1, w0:w1] = cnt
                    cnt += 1
            ids = canvas.view(nh, ws, nw, ws).permute(0, 2, 1, 3)
            ids = ids.reshape(nh * nw, n)
            mask = (ids.unsqueeze(1) - ids.unsqueeze(2))
            mask = mask.masked_fill(mask != 0, -100.0)
            attn = attn.view(B, nh * nw, self.heads, n, n)
            attn = attn + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, n, n)
        attn = F.softmax(attn, -1)
        x = attn.matmul(v).transpose(1, 2).reshape(x.size(0), n, C)
        x = x.view(B, nh, nw, ws, ws, C).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, pH, pW, C)
        if sh or sw:
            x = torch.roll(x, (sh, sw), dims=(1, 2))
        return self.proj(x[:, :H, :W])


class _TSwinBlock(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = _TShiftedWindowAttention(dim, heads, window, shift)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        # Sequential indices 0/3 match torchvision's MLP keys
        self.mlp = nn.Sequential(nn.Linear(dim, 4 * dim), nn.GELU(),
                                 nn.Dropout(0.0), nn.Linear(4 * dim, dim),
                                 nn.Dropout(0.0))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _TPatchMerging(nn.Module):
    """torchvision PatchMerging (v1): pad to even, 2x2 concat, norm
    BEFORE reduction."""

    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim, eps=1e-5)

    def forward(self, x):  # [B, H, W, C]
        B, H, W, C = x.shape
        x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        return self.reduction(self.norm(x))


class TSwin(nn.Module):
    """torchvision swin_* (v1) feature trunk with torchvision state_dict
    naming (`features.{0..7}`), exercising
    utils/port_torch.convert_swin. NCHW in/out taps (NHWC inside, like
    torchvision). Returns the 4 stage taps at strides 4/8/16/32."""

    def __init__(self, depths=(1, 2, 2, 1), dim=16, heads=(1, 2, 4, 8),
                 window=4):
        super().__init__()
        feats = [nn.Sequential(
            nn.Conv2d(3, dim, 4, stride=4, bias=True),
            _TPermute([0, 2, 3, 1]),
            nn.LayerNorm(dim, eps=1e-5))]
        self.tap_idx = []
        for s, depth in enumerate(depths):
            d = dim * (2 ** s)
            if s > 0:
                feats.append(_TPatchMerging(d // 2))
            feats.append(nn.Sequential(*[
                _TSwinBlock(d, heads[s], window,
                            shift=0 if b % 2 == 0 else window // 2)
                for b in range(depth)]))
            self.tap_idx.append(len(feats) - 1)
        self.features = nn.Sequential(*feats)

    def forward(self, x):  # NCHW in
        taps = []
        for i, mod in enumerate(self.features):
            x = mod(x)
            if i in self.tap_idx:
                taps.append(x.permute(0, 3, 1, 2))
        return taps


class TTVFCN(nn.Module):
    """torchvision fcn_resnet50/101 mirror (models/tvseg.FCN): dilated
    os=8 ResNet + FCNHead (3x3 CNA 512 -> 1x1 cls), trailing x8
    bilinear with align_corners=False (the torchvision default). Names
    mirror the flax tree (convert_named heads + convert_resnet
    backbone); dropout omitted like the flax model (param-free)."""

    def __init__(self, num_classes, layers=(3, 4, 6, 3)):
        super().__init__()
        self.backbone = TResNet(_TorchBottleneck, layers,
                                replace_stride_with_dilation=(False, True,
                                                              True))
        self.head = TConvNormAct(2048, 512, 3)
        self.cls_conv = nn.Conv2d(512, num_classes, 1)

    def forward(self, x):
        y = self.backbone(x)[-1]
        return _up(self.cls_conv(self.head(y)), 8, align=False)


class TTVDeepLabV3(nn.Module):
    """torchvision deeplabv3_resnet50/101 mirror (models/tvseg.DeepLabV3):
    ASPP rates (12,24,36) with a global-pool branch, 1x1 project to 256,
    extra 3x3 CNA, 1x1 cls, x8 align_corners=False upsample."""

    def __init__(self, num_classes, layers=(3, 4, 6, 3),
                 rates=(12, 24, 36)):
        super().__init__()
        self.backbone = TResNet(_TorchBottleneck, layers,
                                replace_stride_with_dilation=(False, True,
                                                              True))
        self.aspp_b0 = TConvNormAct(2048, 256, 1)
        for i, r in enumerate(rates):
            setattr(self, f"aspp_b{i + 1}",
                    TConvNormAct(2048, 256, 3, dilation=r))
        self.aspp_pool = TConvNormAct(2048, 256, 1)
        self.aspp_project = TConvNormAct(256 * 5, 256, 1)
        self.head = TConvNormAct(256, 256, 3)
        self.cls_conv = nn.Conv2d(256, num_classes, 1)

    def forward(self, x):
        y = self.backbone(x)[-1]
        branches = [getattr(self, f"aspp_b{i}")(y) for i in range(4)]
        p = self.aspp_pool(F.adaptive_avg_pool2d(y, 1))
        branches.append(p.expand(-1, -1, y.shape[-2], y.shape[-1]))
        y = self.aspp_project(torch.cat(branches, 1))
        return _up(self.cls_conv(self.head(y)), 8, align=False)


class _TSqueezeExcite(nn.Module):
    """torchvision SqueezeExcitation: avgpool -> fc1 1x1 -> ReLU -> fc2
    1x1 -> hardsigmoid scale."""

    def __init__(self, channels, squeeze):
        super().__init__()
        self.fc1 = nn.Conv2d(channels, squeeze, 1)
        self.fc2 = nn.Conv2d(squeeze, channels, 1)

    def forward(self, x):
        s = F.adaptive_avg_pool2d(x, 1)
        s = self.fc2(F.relu(self.fc1(s)))
        return x * F.hardsigmoid(s)


def _t_cna_v3(cin, cout, k=1, stride=1, dilation=1, groups=1, hs=False):
    pad = (k - 1) // 2 * dilation
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, stride=stride, padding=pad,
                  dilation=dilation, groups=groups, bias=False),
        nn.BatchNorm2d(cout),
        nn.Hardswish() if hs else nn.ReLU())


class TMobileNetV3(nn.Module):
    """torchvision mobilenet_v3_large feature trunk with torchvision
    state_dict naming (`features.{0..16}`, block Sequential indices),
    dilated tail (LR-ASPP config) — exercises convert_mobilenetv3.
    Returns the 5 taps (16@s2, 24@s4, 40@s8, 112@s16, 960@s16)."""

    # (kernel, expanded, out, use_se, use_hs, stride) — keep in sync with
    # nn/backbones/mobilenetv3.MOBILENETV3_LARGE_CFG
    CFG = ((3, 16, 16, False, False, 1), (3, 64, 24, False, False, 2),
           (3, 72, 24, False, False, 1), (5, 72, 40, True, False, 2),
           (5, 120, 40, True, False, 1), (5, 120, 40, True, False, 1),
           (3, 240, 80, False, True, 2), (3, 200, 80, False, True, 1),
           (3, 184, 80, False, True, 1), (3, 184, 80, False, True, 1),
           (3, 480, 112, True, True, 1), (3, 672, 112, True, True, 1),
           (5, 672, 160, True, True, 2), (5, 960, 160, True, True, 1),
           (5, 960, 160, True, True, 1))

    def __init__(self, dilated=True):
        super().__init__()
        feats = [_t_cna_v3(3, 16, 3, stride=2, hs=True)]
        cin, dilation = 16, 1

        class _Block(nn.Module):
            def __init__(self, cin, k, exp, out, se, hs, s, d):
                super().__init__()
                layers = []
                if exp != cin:
                    layers.append(_t_cna_v3(cin, exp, 1, hs=hs))
                layers.append(_t_cna_v3(exp, exp, k, stride=s, dilation=d,
                                        groups=exp, hs=hs))
                if se:
                    sq = max(8, int(exp // 4 + 4) // 8 * 8)
                    if sq < 0.9 * (exp // 4):  # _make_divisible 0.9 rule
                        sq += 8
                    layers.append(_TSqueezeExcite(exp, sq))
                layers.append(nn.Sequential(
                    nn.Conv2d(exp, out, 1, bias=False),
                    nn.BatchNorm2d(out), nn.Identity()))
                self.block = nn.Sequential(*layers)
                self.use_res = s == 1 and cin == out

            def forward(self, x):
                y = self.block(x)
                return x + y if self.use_res else y

        for i, (k, exp, out, se, hs, s) in enumerate(self.CFG):
            if dilated and i == 12:
                dilation, s = 2, 1
            feats.append(_Block(cin, k, exp, out, se, hs, s, dilation))
            cin = out
        feats.append(_t_cna_v3(160, 960, 1, hs=True))
        self.features = nn.Sequential(*feats)
        self.tap_idx = (1, 3, 6, 12, 16)

    def forward(self, x):
        taps = []
        for i, mod in enumerate(self.features):
            x = mod(x)
            if i in self.tap_idx:
                taps.append(x)
        return taps


class TLRASPP(nn.Module):
    """models/lraspp.py mirror: torchvision-named backbone (so golden
    parity exercises convert_mobilenetv3) + flax-name-mirrored head
    modules (convert_named)."""

    def __init__(self, num_classes):
        super().__init__()
        self.backbone = TMobileNetV3(dilated=True)
        self.cbr = TConvNormAct(960, 128, 1)
        self.scale_conv = nn.Conv2d(960, 128, 1, bias=False)
        self.low_classifier = nn.Conv2d(40, num_classes, 1)
        self.high_classifier = nn.Conv2d(128, num_classes, 1)

    def forward(self, x):
        taps = self.backbone(x)
        low, high = taps[2], taps[4]
        y = self.cbr(high)
        s = torch.sigmoid(self.scale_conv(F.adaptive_avg_pool2d(high, 1)))
        y = F.interpolate(y * s, size=low.shape[-2:], mode="bilinear",
                          align_corners=False)
        out = self.low_classifier(low) + self.high_classifier(y)
        return _up(out, 8, align=False)


class _TLayerScale(nn.Module):
    """models/segnext.py _Scale mirror: the 1-D `weight` ports to the
    flax 'scale' param through convert_named."""

    def __init__(self, dim, init=1e-2):
        super().__init__()
        self.weight = nn.Parameter(init * torch.ones(dim))

    def forward(self, x):
        return self.weight[None, :, None, None] * x


class _TMSCA(nn.Module):
    """models/segnext.py _MSCA (mmseg MSCAAttention names)."""

    def __init__(self, dim):
        super().__init__()
        dw = dict(groups=dim)
        self.conv0 = nn.Conv2d(dim, dim, 5, padding=2, **dw)
        self.conv0_1 = nn.Conv2d(dim, dim, (1, 7), padding=(0, 3), **dw)
        self.conv0_2 = nn.Conv2d(dim, dim, (7, 1), padding=(3, 0), **dw)
        self.conv1_1 = nn.Conv2d(dim, dim, (1, 11), padding=(0, 5), **dw)
        self.conv1_2 = nn.Conv2d(dim, dim, (11, 1), padding=(5, 0), **dw)
        self.conv2_1 = nn.Conv2d(dim, dim, (1, 21), padding=(0, 10), **dw)
        self.conv2_2 = nn.Conv2d(dim, dim, (21, 1), padding=(10, 0), **dw)
        self.conv3 = nn.Conv2d(dim, dim, 1)

    def forward(self, x):
        attn = self.conv0(x)
        a0 = self.conv0_2(self.conv0_1(attn))
        a1 = self.conv1_2(self.conv1_1(attn))
        a2 = self.conv2_2(self.conv2_1(attn))
        attn = self.conv3(attn + a0 + a1 + a2)
        return attn * x


class _TMSCABlock(nn.Module):
    """models/segnext.py _Block: BN -> spatial attention (+ls1),
    BN -> MixFFN (+ls2)."""

    def __init__(self, dim, mlp_ratio):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(dim, momentum=0.1, eps=1e-5)
        self.attn = nn.Module()
        self.attn.proj_1 = nn.Conv2d(dim, dim, 1)
        self.attn.spatial_gating_unit = _TMSCA(dim)
        self.attn.proj_2 = nn.Conv2d(dim, dim, 1)
        self.layer_scale_1 = _TLayerScale(dim)
        self.norm2 = nn.BatchNorm2d(dim, momentum=0.1, eps=1e-5)
        hidden = dim * mlp_ratio
        self.fc1 = nn.Conv2d(dim, hidden, 1)
        self.dwconv = nn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden)
        self.fc2 = nn.Conv2d(hidden, dim, 1)
        self.layer_scale_2 = _TLayerScale(dim)

    def forward(self, x):
        h = self.norm1(x)
        # spatial attention's residual is over the NORMED input (mmseg
        # MSCASpatialAttention adds its own shortcut inside)
        a = self.attn.proj_2(
            self.attn.spatial_gating_unit(F.gelu(self.attn.proj_1(h))))
        x = x + self.layer_scale_1(a + h)
        h = self.norm2(x)
        h = self.fc2(F.gelu(self.dwconv(self.fc1(h))))
        return x + self.layer_scale_2(h)


def _t_nmf2d(x, bases_dr, steps, eps=1e-6):
    """models/segnext.py nmf2d mirror: x [B, C, H, W] f32, bases [D, R]
    (the shared deterministic init). The Ham one-step gradient: the MU
    iterations run under no_grad (mmseg local_inference); only the final
    coef update + reconstruction are differentiable."""
    b, d, h, w = x.shape
    xf = x.reshape(b, d, h * w).transpose(1, 2)  # [B, N, D]
    bases = torch.as_tensor(bases_dr)[None].expand(b, -1, -1)  # [B, D, R]

    def coef_update(xin, coef, bases):
        num = torch.bmm(xin, bases)
        den = torch.bmm(coef, torch.bmm(bases.transpose(1, 2), bases))
        return coef * num / (den + eps)

    with torch.no_grad():
        coef = torch.softmax(torch.bmm(xf, bases), dim=-1)  # [B, N, R]
        for _ in range(steps):
            coef = coef_update(xf, coef, bases)
            num = torch.bmm(xf.transpose(1, 2), coef)  # [B, D, R]
            den = torch.bmm(bases, torch.bmm(coef.transpose(1, 2), coef))
            bases = bases * num / (den + eps)
    coef = coef_update(xf, coef, bases)
    out = torch.bmm(bases, coef.transpose(1, 2))  # [B, D, N]
    return out.reshape(b, d, h, w)


class _TGNConv(nn.Module):
    """models/segnext.py _GNConv: 1x1 (no bias) + GN(32) + ReLU."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 1, bias=False)
        self.gn = nn.GroupNorm(32, cout, eps=1e-5)

    def forward(self, x):
        return F.relu(self.gn(self.conv(x)))


class TSegNeXt(nn.Module):
    """models/segnext.py mirror: MSCAN encoder + LightHam head, flax
    module names throughout (convert_named)."""

    def __init__(self, num_classes, variant="tiny"):
        super().__init__()
        from pytorch_segmentation_tpu.models.segnext import (MSCAN_VARIANTS,
                                                             nmf_bases)
        depths, dims, ratios, ham_ch, rank = MSCAN_VARIANTS[variant]
        self.rank, self.ham_ch = rank, ham_ch
        self.bases = nmf_bases(ham_ch, rank)
        bb = nn.Module()
        bb.stem1 = TConvNormAct(3, dims[0] // 2, 3, stride=2,
                                activate="gelu")
        bb.stem2 = TConvNormAct(dims[0] // 2, dims[0], 3, stride=2,
                                activate=None)
        for s in range(1, 4):
            setattr(bb, f"embed{s}",
                    TConvNormAct(dims[s - 1], dims[s], 3, stride=2,
                                 activate=None))
        for s, (depth, dim, ratio) in enumerate(zip(depths, dims, ratios)):
            for i in range(depth):
                setattr(bb, f"stage{s}_block{i}", _TMSCABlock(dim, ratio))
            setattr(bb, f"stage{s}_norm", nn.LayerNorm(dim, eps=1e-6))
        self.backbone = bb
        self.squeeze = _TGNConv(sum(dims[1:]), ham_ch)
        ham = nn.Module()
        ham.ham_in = nn.Conv2d(ham_ch, ham_ch, 1)
        ham.ham_out = nn.Conv2d(ham_ch, ham_ch, 1, bias=False)
        ham.ham_out_gn = nn.GroupNorm(32, ham_ch, eps=1e-5)
        self.hamburger = ham
        self.align = _TGNConv(ham_ch, ham_ch)
        self.cls_conv = nn.Conv2d(ham_ch, num_classes, 1)
        self.depths = depths

    def forward(self, x):
        bb = self.backbone
        x = bb.stem2(bb.stem1(x))
        taps = []
        for s in range(4):
            if s > 0:
                x = getattr(bb, f"embed{s}")(x)
            for i in range(self.depths[s]):
                x = getattr(bb, f"stage{s}_block{i}")(x)
            x = getattr(bb, f"stage{s}_norm")(
                x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            taps.append(x)
        base_hw = taps[1].shape[-2:]
        feats = [taps[1]] + [
            F.interpolate(t, size=base_hw, mode="bilinear",
                          align_corners=False) for t in taps[2:]]
        y = self.squeeze(torch.cat(feats, dim=1))
        h = F.relu(self.hamburger.ham_in(y))
        h = _t_nmf2d(h, self.bases, steps=6 if self.training else 7)
        h = self.hamburger.ham_out_gn(self.hamburger.ham_out(h))
        y = F.relu(y + h)
        y = self.align(y)
        out = self.cls_conv(y)
        return F.interpolate(out, scale_factor=8, mode="bilinear",
                             align_corners=False)


class _TViTBlock(nn.Module):
    """torchvision EncoderBlock naming: ln_1 / self_attention (fused
    in_proj) / ln_2 / mlp.{0,3}."""

    def __init__(self, dim, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(dim, eps=1e-6)
        self.self_attention = nn.MultiheadAttention(dim, heads,
                                                    batch_first=True)
        self.ln_2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential(nn.Linear(dim, 4 * dim), nn.GELU(),
                                 nn.Dropout(0.0), nn.Linear(4 * dim, dim))

    def forward(self, x):
        h, _ = self.self_attention(self.ln_1(x), self.ln_1(x),
                                   self.ln_1(x), need_weights=False)
        x = x + h
        return x + self.mlp(self.ln_2(x))


class TViT(nn.Module):
    """nn/backbones/vit.py mirror with torchvision vit_b_16 naming
    (exercises convert_vit): conv_proj, class_token,
    encoder.pos_embedding, encoder.layers.encoder_layer_i."""

    def __init__(self, layers=4, dim=32, heads=2, patch=16, base_grid=4,
                 out_indices=(0, 1, 2, 3)):
        super().__init__()
        self.patch, self.base_grid = patch, base_grid
        self.out_indices, self.n_layers, self.dim = out_indices, layers, dim
        self.conv_proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.class_token = nn.Parameter(0.02 * torch.randn(1, 1, dim))
        enc = nn.Module()
        enc.pos_embedding = nn.Parameter(
            0.02 * torch.randn(1, 1 + base_grid ** 2, dim))
        enc.layers = nn.Module()
        for i in range(layers):
            setattr(enc.layers, f"encoder_layer_{i}",
                    _TViTBlock(dim, heads))
        self.encoder = enc

    def forward(self, x):
        x = self.conv_proj(x)  # [B, C, gh, gw]
        b, c, gh, gw = x.shape
        tokens = x.flatten(2).transpose(1, 2)  # [B, N, C]
        pos = self.encoder.pos_embedding
        grid = pos[:, 1:].reshape(1, self.base_grid, self.base_grid,
                                  c).permute(0, 3, 1, 2)
        if (gh, gw) != (self.base_grid, self.base_grid):
            grid = F.interpolate(grid, size=(gh, gw), mode="bicubic",
                                 align_corners=False)
        pos = torch.cat([pos[:, :1],
                         grid.permute(0, 2, 3, 1).reshape(1, gh * gw, c)],
                        dim=1)
        seq = torch.cat([self.class_token.expand(b, -1, -1), tokens], 1)
        seq = seq + pos
        taps = []
        for i in range(self.n_layers):
            seq = getattr(self.encoder.layers, f"encoder_layer_{i}")(seq)
            if i in self.out_indices:
                taps.append(seq[:, 1:].transpose(1, 2).reshape(b, c, gh,
                                                               gw))
        return taps


class _TFlaxViTBlock(nn.Module):
    """nn/backbones/vit._ViTBlock with FLAX names (ln1/qkv/proj/ln2/
    fc1/fc2) for convert_named ports (the decoder side of TSegmenter;
    the torchvision-named _TViTBlock is for convert_vit)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.ln1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.ln2 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, 4 * dim)
        self.fc2 = nn.Linear(4 * dim, dim)

    def forward(self, x):
        b, t, c = x.shape
        hd = c // self.heads
        qkv = self.qkv(self.ln1(x)).reshape(b, t, 3, self.heads, hd)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)).softmax(-1)
        y = (attn @ v).transpose(1, 2).reshape(b, t, c)
        x = x + self.proj(y)
        return x + self.fc2(F.gelu(self.fc1(self.ln2(x))))


class TSegmenter(nn.Module):
    """models/segmenter.py mirror: TViT trunk (torchvision names ->
    convert_vit) + Mask Transformer decoder with flax-mirrored names
    (convert_named; cls_emb is a bare Parameter that ports verbatim)."""

    class _Decoder(nn.Module):
        def __init__(self, num_classes, dim, heads, n_layers=2):
            super().__init__()
            self.proj_dec = nn.Linear(dim, dim)
            self.cls_emb = nn.Parameter(0.02 * torch.randn(1, num_classes,
                                                           dim))
            for i in range(n_layers):
                setattr(self, f"block{i}", _TFlaxViTBlock(dim, heads))
            self.n_layers = n_layers
            self.decoder_norm = nn.LayerNorm(dim, eps=1e-6)
            self.proj_patch = nn.Linear(dim, dim, bias=False)
            self.proj_classes = nn.Linear(dim, dim, bias=False)
            self.mask_norm = nn.LayerNorm(num_classes, eps=1e-6)

        def forward(self, x):  # [B, N, C]
            b, n, _ = x.shape
            x = self.proj_dec(x)
            x = torch.cat([x, self.cls_emb.expand(b, -1, -1)], dim=1)
            for i in range(self.n_layers):
                x = getattr(self, f"block{i}")(x)
            x = self.decoder_norm(x)
            patches, cls_tok = x[:, :n], x[:, n:]
            patches = self.proj_patch(patches)
            cls_tok = self.proj_classes(cls_tok)
            patches = patches / patches.norm(dim=-1, keepdim=True)
            cls_tok = cls_tok / cls_tok.norm(dim=-1, keepdim=True)
            return self.mask_norm(patches @ cls_tok.transpose(1, 2))

    def __init__(self, num_classes, layers=4, dim=32, heads=2, patch=16,
                 base_grid=4):
        super().__init__()
        self.backbone = TViT(layers=layers, dim=dim, heads=heads,
                             patch=patch, base_grid=base_grid,
                             out_indices=(layers - 1,))
        self.decoder = self._Decoder(num_classes, dim, heads)
        self.patch = patch

    def forward(self, x):
        h, w = x.shape[-2:]
        feat = self.backbone(x)[-1]  # [B, C, gh, gw]
        b, c, gh, gw = feat.shape
        masks = self.decoder(feat.flatten(2).transpose(1, 2))
        masks = masks.transpose(1, 2).reshape(b, -1, gh, gw)
        return F.interpolate(masks, size=(h, w), mode="bilinear",
                             align_corners=False)


def _t_sine_pos_embed(h, w, dim):
    """models/maskformer.py _sine_pos_embed mirror (identical numpy)."""
    half = dim // 2
    y = np.arange(h, dtype=np.float32)[:, None]
    x = np.arange(w, dtype=np.float32)[None, :]
    omega = 1.0 / (10000.0 ** (np.arange(half // 2, dtype=np.float32)
                               / (half // 2)))
    out = []
    for pos in (np.broadcast_to(y, (h, w)), np.broadcast_to(x, (h, w))):
        ang = pos[..., None] * omega
        out.append(np.sin(ang))
        out.append(np.cos(ang))
    pe = np.concatenate(out, -1).reshape(h * w, 2 * (half // 2) * 2)
    if pe.shape[-1] < dim:
        pe = np.pad(pe, ((0, 0), (0, dim - pe.shape[-1])))
    return torch.from_numpy(pe[:, :dim].copy())


class _TMFAttention(nn.Module):
    """models/maskformer.py _MHA mirror (separate q/k/v/proj Linears,
    DETR additive pos on q/k only)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads
        self.dim = dim

    def forward(self, q, k, v, q_pos=None, k_pos=None):
        b, nq, _ = q.shape
        nk = k.shape[1]
        hd = self.dim // self.heads
        qi = q if q_pos is None else q + q_pos
        ki = k if k_pos is None else k + k_pos
        qh = self.q(qi).reshape(b, nq, self.heads, hd)
        kh = self.k(ki).reshape(b, nk, self.heads, hd)
        vh = self.v(v).reshape(b, nk, self.heads, hd)
        scores = torch.einsum("bqhd,bkhd->bhqk", qh * (hd ** -0.5), kh)
        attn = scores.softmax(-1)
        y = torch.einsum("bhqk,bkhd->bqhd", attn, vh)
        return self.proj(y.reshape(b, nq, self.dim))


class _TMFDecoderLayer(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.self_attn = _TMFAttention(dim, heads)
        self.cross_attn = _TMFAttention(dim, heads)
        self.fc1 = nn.Linear(dim, 4 * dim)
        self.fc2 = nn.Linear(4 * dim, dim)
        self.ln1 = nn.LayerNorm(dim, eps=1e-5)
        self.ln2 = nn.LayerNorm(dim, eps=1e-5)
        self.ln3 = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, q, mem, q_pos, m_pos):
        q = self.ln1(q + self.self_attn(q, q, q, q_pos=q_pos, k_pos=q_pos))
        q = self.ln2(q + self.cross_attn(q, mem, mem, q_pos=q_pos,
                                         k_pos=m_pos))
        return self.ln3(q + self.fc2(F.relu(self.fc1(q))))


class TMaskFormer(nn.Module):
    """models/maskformer.py mirror (Cheng et al. 2021 semantic config —
    an addition beyond the reference): ResNet -> FPN pixel decoder ->
    stride-4 pixel embedding; Q queries through post-norm DETR layers on
    C5 tokens + sine pos; class head K+1, 3-layer mask MLP; mask logits
    by embedding dot product. Names mirror the flax tree (convert_named;
    query_embed is a bare Parameter, verbatim port). forward returns
    semantic scores (or (cls, mask, sem) with return_heads=True)."""

    def __init__(self, num_classes, layers=(3, 4, 6, 3), block=None,
                 num_queries=100, dim=256, mask_dim=256, heads=8,
                 dec_layers=6, fpn_channels=256):
        super().__init__()
        block = block or _TorchBottleneck
        self.backbone = TResNet(block, layers)
        chans = [64 * block.expansion * (2 ** i) for i in range(4)]
        for i in range(4):
            setattr(self, f"lat{i}",
                    TConvNormAct(chans[i], fpn_channels, 1, activate=None))
        self.pix0 = TConvNormAct(fpn_channels, fpn_channels, 3)
        self.pixel_proj = nn.Conv2d(fpn_channels, mask_dim, 3, padding=1)
        self.input_proj = nn.Conv2d(chans[3], dim, 1)
        self.query_embed = nn.Parameter(torch.randn(num_queries, dim))
        for i in range(dec_layers):
            setattr(self, f"dec{i}", _TMFDecoderLayer(dim, heads))
        self.dec_norm = nn.LayerNorm(dim, eps=1e-5)
        self.cls_head = nn.Linear(dim, num_classes + 1)
        self.mask_mlp0 = nn.Linear(dim, dim)
        self.mask_mlp1 = nn.Linear(dim, dim)
        self.mask_mlp2 = nn.Linear(dim, mask_dim)
        self.dec_layers = dec_layers
        self.num_classes = num_classes

    def forward(self, x, return_heads=False):
        feats = self.backbone(x)[1:]
        sizes = [f.shape[-2:] for f in feats]
        p = self.lat3(feats[3])
        pyramid = [p]
        for i in (2, 1, 0):
            lat = getattr(self, f"lat{i}")(feats[i])
            p = lat + F.interpolate(p, size=sizes[i], mode="nearest")
            pyramid.insert(0, p)
        pixel_emb = self.pixel_proj(self.pix0(pyramid[0]))

        c5 = feats[3]
        b, _, h5, w5 = c5.shape
        mem = self.input_proj(c5).flatten(2).transpose(1, 2)
        m_pos = _t_sine_pos_embed(h5, w5, mem.shape[-1])[None]
        q_pos = self.query_embed[None]
        def heads(qn):
            cl = self.cls_head(qn)
            e = self.mask_mlp2(F.relu(self.mask_mlp1(
                F.relu(self.mask_mlp0(qn)))))
            return cl, torch.einsum("bqc,bchw->bqhw", e, pixel_emb)

        q = torch.zeros(b, self.query_embed.shape[0],
                        self.query_embed.shape[1])
        aux = []
        for i in range(self.dec_layers):
            q = getattr(self, f"dec{i}")(q, mem, q_pos, m_pos)
            if return_heads == "all" and i < self.dec_layers - 1:
                aux.append(heads(self.dec_norm(q)))  # shared norm + heads
        q = self.dec_norm(q)

        cls_logits, mask_logits = heads(q)
        p_cls = cls_logits.softmax(-1)[..., :self.num_classes]
        sem = torch.einsum("bqc,bqhw->bchw", p_cls, mask_logits.sigmoid())
        sem = F.interpolate(sem, scale_factor=4, mode="bilinear",
                            align_corners=False)
        if return_heads == "all":
            return cls_logits, mask_logits, aux, sem
        if return_heads:
            return cls_logits, mask_logits, sem
        return sem
