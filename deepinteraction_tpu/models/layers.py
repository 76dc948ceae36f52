"""Shared flax building blocks (NHWC, TPU-friendly layouts).

BatchNorm conventions: torch momentum m -> flax momentum 1 - m. The
reference overrides encoder/decoder BN momentum to 0.1 (torch)
(deepinteraction_encoder.py:74-77) and SECOND's to 0.01.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.LayerNorm uses eps=1e-5 (flax defaults to 1e-6) and a two-pass
# variance (flax's default fast variance E[x^2]-E[x]^2 cancels to ~5e-4
# error per block at f32). The reference's decoder/fusion/swin norms are
# all plain nn.LayerNorm, so pin both torch behaviors (surfaced by the
# MMPI golden tests).
TorchLayerNorm = functools.partial(
    nn.LayerNorm, epsilon=1e-5, use_fast_variance=False
)


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


class TorchMHA(nn.Module):
    """Multi-head attention with torch ``nn.MultiheadAttention`` semantics
    (separate q/k/v Dense = the unpacked in_proj; scale 1/sqrt(head_dim);
    boolean key mask -> -inf logits). Inputs are [B, L, E] / [B, S, E]."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, key_mask=None, attn_mask=None, train: bool = False):
        e, h = self.embed_dim, self.num_heads
        hd = e // h
        b, l = q.shape[0], q.shape[1]
        s = k.shape[1]
        qp = nn.Dense(e, name="q_proj")(q).reshape(b, l, h, hd)
        kp = nn.Dense(e, name="k_proj")(k).reshape(b, s, h, hd)
        vp = nn.Dense(e, name="v_proj")(v).reshape(b, s, h, hd)
        logits = jnp.einsum("blhd,bshd->bhls", qp, kp) / jnp.sqrt(jnp.float32(hd))
        if key_mask is not None:  # [B, S] True = attend
            logits = jnp.where(key_mask[:, None, None, :], logits, -jnp.inf)
        if attn_mask is not None:  # [B, L, S] True = attend
            logits = jnp.where(attn_mask[:, None, :, :], logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = jnp.where(jnp.isnan(attn), 0.0, attn)  # fully-masked rows
        if self.dropout > 0.0 and train:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, attn.shape)
            attn = attn * keep / (1.0 - self.dropout)
        out = jnp.einsum("bhls,bshd->blhd", attn, vp).reshape(b, l, e)
        return nn.Dense(e, name="out_proj")(out)


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
            x = nn.Dense(self.hidden, name=f"fc{i}")(x)
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


class DropPath(nn.Module):
    """Stochastic depth (per-sample residual drop; timm/mmcv semantics).

    The reference's Swin blocks wrap both residual branches in DropPath with
    a 0->drop_path_rate linear schedule across blocks (reference
    swin.py:283-458; ++ config Fusion_0075_plusplus.py:159 sets 0.2).
    Training: keep each sample's branch with prob 1-rate, scaled by
    1/(1-rate); eval: identity.
    """

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)
