"""Torch trunk oracles with mmdet/mmdet3d state-dict layouts.

The reference's trunk blocks come from external frameworks that don't exist
here: mmdet ResNet + FPN (config Fusion_0075_refactor.py:132-145), mmdet3d
SECOND + the patched SECONDFPN (config L169-184,
models/updated_modules/second_fpn.py:15-24). These stand-ins replicate the
exact module structure AND state-dict key names of those frameworks (the
same pattern as ref_shims' ConvModule stand-in), so tools/verify_ckpt.py
can run converted-weight activation diffs through the real converter rules
(utils/torch_convert.py) — a silent converter layout bug in any trunk block
(e.g. a transposed conv kernel) shifts every downstream number and must
fail here (VERDICT r4 #8).

Semantics notes (matched to mmdet/mmdet3d and to our flax modules):
- ResNet 'pytorch' style: stride on the bottleneck's 3x3 conv.
- FPN: lateral 1x1 convs WITH bias (ConvModule, no norm), top-down nearest
  upsample + add, 3x3 output convs, extra levels by 1x1 max-pool stride 2.
- SECOND blocks are nn.Sequential [Conv, BN(eps 1e-3, mom .01), ReLU] x
  (1 + layer_num) -> conv at indices 0,3,6,..., BN at 1,4,7,...
- SECONDFPN deblocks: [ConvTranspose2d(k=s, stride=s) | Conv2d 1x1, BN,
  ReLU]; the patched forward returns [concat(ups)] + ups.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class _BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        # mmdet 'pytorch' style: stride on the 3x3
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        if stride != 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


_RESNET_SPECS = {
    18: (_BasicBlock, (2, 2, 2, 2)),
    34: (_BasicBlock, (3, 4, 6, 3)),
    50: (_Bottleneck, (3, 4, 6, 3)),
    101: (_Bottleneck, (3, 4, 23, 3)),
}


class TorchResNet(nn.Module):
    """mmdet/torchvision key layout: conv1, bn1, layer{1..4}.{j}.*"""

    def __init__(self, depth=50, out_indices=(0, 1, 2, 3)):
        super().__init__()
        block, stage_blocks = _RESNET_SPECS[depth]
        self.out_indices = out_indices
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        inplanes = 64
        for i, (n, planes) in enumerate(zip(stage_blocks, (64, 128, 256, 512))):
            layers = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                layers.append(block(inplanes, planes, stride))
                inplanes = planes * block.expansion
            setattr(self, f"layer{i + 1}", nn.Sequential(*layers))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        outs = []
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            if i in self.out_indices:
                outs.append(x)
        return outs


class _FPNConvModule(nn.Module):
    """mmcv ConvModule with no norm/act: keys '<name>.conv.weight/.bias'."""

    def __init__(self, cin, cout, k, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, padding=padding)

    def forward(self, x):
        return self.conv(x)


class TorchFPN(nn.Module):
    """mmdet FPN key layout: lateral_convs.{i}.conv, fpn_convs.{i}.conv."""

    def __init__(self, in_channels, out_channels=256, num_outs=5):
        super().__init__()
        self.num_outs = num_outs
        self.lateral_convs = nn.ModuleList(
            [_FPNConvModule(c, out_channels, 1) for c in in_channels]
        )
        self.fpn_convs = nn.ModuleList(
            [_FPNConvModule(out_channels, out_channels, 3, padding=1) for _ in in_channels]
        )

    def forward(self, inputs):
        laterals = [l(x) for l, x in zip(self.lateral_convs, inputs)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], size=laterals[i - 1].shape[-2:], mode="nearest"
            )
        outs = [conv(l) for conv, l in zip(self.fpn_convs, laterals)]
        for _ in range(self.num_outs - len(outs)):
            outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs


def _bn(c):
    return nn.BatchNorm2d(c, eps=1e-3, momentum=0.01)


class TorchSECOND(nn.Module):
    """mmdet3d SECOND key layout: blocks.{i} = Sequential(ZeroPad2d, Conv,
    BN, ReLU, [Conv, BN, ReLU] * layer_num) — conv params at seq indices
    1, 4, 7, ... (utils/torch_convert.py::_second_key)."""

    def __init__(self, in_channels=256, out_channels=(128, 256), layer_nums=(5, 5), layer_strides=(1, 2)):
        super().__init__()
        blocks = []
        cin = in_channels
        for c, n, s in zip(out_channels, layer_nums, layer_strides):
            layers = [
                nn.ZeroPad2d(1),
                nn.Conv2d(cin, c, 3, s, 0, bias=False),
                _bn(c),
                nn.ReLU(),
            ]
            for _ in range(n):
                layers += [nn.Conv2d(c, c, 3, 1, 1, bias=False), _bn(c), nn.ReLU()]
            blocks.append(nn.Sequential(*layers))
            cin = c
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        outs = []
        for b in self.blocks:
            x = b(x)
            outs.append(x)
        return outs


class TorchSECONDFPN(nn.Module):
    """mmdet3d SECONDFPN (patched 3-output variant, second_fpn.py:15-24):
    deblocks.{i}.0 = deconv/conv, .1 = BN."""

    def __init__(self, in_channels=(128, 256), out_channels=(256, 256), upsample_strides=(1, 2)):
        super().__init__()
        deblocks = []
        for cin, c, s in zip(in_channels, out_channels, upsample_strides):
            if s > 1:
                up = nn.ConvTranspose2d(cin, c, s, stride=s, bias=False)
            else:  # use_conv_for_no_stride=True
                up = nn.Conv2d(cin, c, 1, bias=False)
            deblocks.append(nn.Sequential(up, _bn(c), nn.ReLU()))
        self.deblocks = nn.ModuleList(deblocks)

    def forward(self, inputs):
        ups = [d(x) for d, x in zip(self.deblocks, inputs)]
        return [torch.cat(ups, dim=1)] + ups
