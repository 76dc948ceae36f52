"""FPN image neck (mmdet semantics).

Reference config: FPN(in=[256,512,1024,2048], out=256, num_outs=5)
(Fusion_0075_refactor.py:141-145). mmdet defaults reproduced: lateral 1x1
convs (with bias, no norm), top-down nearest upsample + add, 3x3 output
convs, extra levels by stride-2 max-pool on the last output. Only level 0
(stride 4) feeds the fusion encoder (out_size_factor_img=4, config L197).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _upsample_nearest_2x(x: jnp.ndarray, target_hw) -> jnp.ndarray:
    th, tw = target_hw
    return jax.image.resize(x, (*x.shape[:-3], th, tw, x.shape[-1]), method="nearest")


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = None  # activation dtype (params stay f32); see resnet.py

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        n = len(inputs)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")(inputs[i])
            for i in range(n)
        ]
        for i in range(n - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(
                laterals[i], laterals[i - 1].shape[-3:-1]
            )
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name=f"fpn{i}")(laterals[i])
            for i in range(n)
        ]
        for _ in range(self.num_outs - n):
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs
