"""ResNet image backbone (torchvision/mmdet 'pytorch'-style layout).

Reference uses mmdet ResNet-50 with frozen_stages=1, BN eval, out_indices
(0,1,2,3) (config Fusion_0075_refactor.py:132-140). Layout matches
torchvision so the released checkpoint converts 1:1 (stride on the 3x3 conv
of each bottleneck = 'pytorch' style).

Freezing is a trainer concern here (zero-grad masks + BN in eval mode), not
a graph concern: the module itself is pure.

``dtype`` is the activation/computation dtype (params stay f32): the dense
image branch is HBM-bandwidth-bound on TPU at f32 activations (the MXU
already multiplies at bf16 by default), so eval can run it at bf16 via
DI_DENSE_BF16 (see detector.py) for ~half the activation traffic.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    bn_momentum: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        identity = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=1, use_bias=False, dtype=dt, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=1 - self.bn_momentum, dtype=dt, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=1 - self.bn_momentum, dtype=dt, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), (self.stride, self.stride), use_bias=False, dtype=dt, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=1 - self.bn_momentum, dtype=dt, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = 4x
    stride: int = 1
    bn_momentum: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=dt, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=1 - self.bn_momentum, dtype=dt, name="bn1")(y)
        y = nn.relu(y)
        # 'pytorch' style: stride on the 3x3
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=1, use_bias=False, dtype=dt, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=1 - self.bn_momentum, dtype=dt, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=dt, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=1 - self.bn_momentum, dtype=dt, name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != self.features * 4:
            identity = nn.Conv(self.features * 4, (1, 1), (self.stride, self.stride), use_bias=False, dtype=dt, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=1 - self.bn_momentum, dtype=dt, name="downsample_bn")(identity)
        return nn.relu(y + identity)


_SPECS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
}


class ResNet(nn.Module):
    depth: int = 50
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    bn_momentum: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        block, stage_blocks = _SPECS[self.depth]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=1 - self.bn_momentum, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch maxpool 3x3 s2 p1
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        outs = []
        widths = (64, 128, 256, 512)
        for i, (n, w) in enumerate(zip(stage_blocks, widths)):
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                x = block(w, stride, self.bn_momentum, self.dtype, name=f"layer{i + 1}_{j}")(x, train)
            if i in self.out_indices:
                outs.append(x)
        return outs
