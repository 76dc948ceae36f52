"""SECOND dense BEV backbone + patched SECONDFPN neck.

Reference: mmdet3d SECOND/SECONDFPN (config Fusion_0075_refactor.py:169-184)
with the repo's patched FPN returning [concat(ups), up0, up1] instead of
[concat] (models/updated_modules/second_fpn.py:15-24) — the decoder needs
both the 512-ch concat map and the per-scale maps.

BN: eps 1e-3, torch momentum 0.01 per config.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

BN_EPS = 1e-3
BN_MOM = 0.01  # torch convention


class SECOND(nn.Module):
    out_channels: Tuple[int, ...] = (128, 256)
    layer_nums: Tuple[int, ...] = (5, 5)
    layer_strides: Tuple[int, ...] = (1, 2)
    dtype: Any = None  # activation dtype (params stay f32); see resnet.py

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        outs = []
        for i, (c, n, s) in enumerate(
            zip(self.out_channels, self.layer_nums, self.layer_strides)
        ):
            x = nn.Conv(c, (3, 3), (s, s), padding=1, use_bias=False, dtype=self.dtype, name=f"block{i}_conv0")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=1 - BN_MOM, epsilon=BN_EPS,
                dtype=self.dtype, name=f"block{i}_bn0",
            )(x)
            x = nn.relu(x)
            for j in range(n):
                x = nn.Conv(c, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name=f"block{i}_conv{j + 1}")(x)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=1 - BN_MOM, epsilon=BN_EPS,
                    dtype=self.dtype, name=f"block{i}_bn{j + 1}",
                )(x)
                x = nn.relu(x)
            outs.append(x)
        return outs


class SECONDFPN(nn.Module):
    out_channels: Tuple[int, ...] = (256, 256)
    upsample_strides: Tuple[int, ...] = (1, 2)
    dtype: Any = None  # activation dtype (params stay f32); see resnet.py

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        ups = []
        for i, (c, s) in enumerate(zip(self.out_channels, self.upsample_strides)):
            x = inputs[i]
            if self.dtype is not None:
                x = x.astype(self.dtype)
            if s > 1:
                # transpose_kernel=True == torch ConvTranspose2d semantics
                # (validated in tests/test_torch_parity.py); kernel layout
                # [kh, kw, Out, In] matches the weight converter's output
                x = nn.ConvTranspose(
                    c, (s, s), strides=(s, s), padding="VALID", use_bias=False,
                    transpose_kernel=True, dtype=self.dtype,
                    name=f"deblock{i}_conv",
                )(x)
            else:
                # use_conv_for_no_stride=True -> 1x1 conv
                x = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name=f"deblock{i}_conv")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=1 - BN_MOM, epsilon=BN_EPS,
                dtype=self.dtype, name=f"deblock{i}_bn",
            )(x)
            x = nn.relu(x)
            ups.append(x)
        concat = jnp.concatenate(ups, axis=-1)
        # patched return: [concat, up0, up1] (reference second_fpn.py:15-24)
        return [concat] + ups
