"""Shared flax building blocks (NHWC, TPU-friendly layouts).

BatchNorm conventions: torch momentum m -> flax momentum 1 - m. The
reference overrides encoder/decoder BN momentum to 0.1 (torch)
(deepinteraction_encoder.py:74-77) and SECOND's to 0.01.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBNReLU(nn.Module):
    """Conv2d + optional BN + optional ReLU, matching the reference helper
    (models/utils/encoder_utils.py:11-34): bias='auto' => bias iff no norm."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_norm: bool = True
    use_act: bool = True
    bn_momentum: float = 0.1  # torch convention
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.kernel_size // 2,
            use_bias=not self.use_norm,
            name="conv",
        )(x)
        if self.use_norm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=1.0 - self.bn_momentum,
                epsilon=self.bn_eps,
                name="bn",
            )(x)
        if self.use_act:
            x = nn.relu(x)
        return x


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the valid rows of [..., N, C] masked sets.

    Used for sparse voxel features and query/pos-embedding vectors where
    padding rows must not pollute the statistics (torch BN1d sees only real
    voxels because spconv tensors are dynamically sized).
    """

    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            m = mask.astype(jnp.float32)[..., None]
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / cnt
            var = (
                jnp.sum(m * (x - mean) ** 2, axis=tuple(range(x.ndim - 1))) / cnt
            )
            if not self.is_initializing():
                ra_mean.value = (
                    (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                # torch uses unbiased var for running stats
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_var.value = (
                    (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return jnp.where(mask[..., None], y, 0.0)


class MLP1d(nn.Module):
    """Conv1d(k=1) stack as used by prediction heads: per-element Dense."""

    hidden: int
    out: int
    num_layers: int = 2
    bn_momentum: float = 0.1
    final_bias_init: Optional[float] = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden, use_bias=False, name=f"fc{i}")(x)
            if mask is None:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=1.0 - self.bn_momentum,
                    name=f"bn{i}",
                )(x)
            else:
                x = MaskedBatchNorm(momentum=self.bn_momentum, name=f"bn{i}")(
                    x, mask, train
                )
            x = nn.relu(x)
        bias_init = (
            nn.initializers.constant(self.final_bias_init)
            if self.final_bias_init is not None
            else nn.initializers.zeros
        )
        return nn.Dense(self.out, bias_init=bias_init, name="out")(x)
