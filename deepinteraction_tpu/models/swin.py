"""Swin Transformer image backbone (for DeepInteraction++).

Rebuild of the reference's vendored Swin-T (models/backbones/swin.py:460-754):
patch embed (4x4), 4 stages of shifted-window attention blocks with patch
merging between stages, per-stage LayerNorm outputs at strides 4/8/16/32.

Window attention runs as dense [nW, w*w, w*w] batched attention — ideal MXU
shape; the cyclic shift is jnp.roll (reference uses the same trick,
swin.py:124-281).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import DropPath, TorchLayerNorm


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + ws - 1
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowMSA(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        """x [nW, N, C]; mask [nW0, N, N] additive or None."""
        ws, h = self.window_size, self.num_heads
        nw, n, c = x.shape
        hd = c // h
        qkv = nn.Dense(3 * c, name="qkv")(x).reshape(nw, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("wnhd,wmhd->whnm", q, k) / jnp.sqrt(jnp.float32(hd))
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, h),
        )
        idx = jnp.asarray(_rel_pos_index(ws))
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            g = mask.shape[0]
            attn = attn.reshape(nw // g, g, h, n, n) + mask[None, :, None]
            attn = attn.reshape(nw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop_rate, deterministic=not train)(attn)
        out = jnp.einsum("whnm,wmhd->wnhd", attn, v).reshape(nw, n, c)
        out = nn.Dense(c, name="proj")(out)
        return nn.Dropout(self.proj_drop_rate, deterministic=not train)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: bool
    drop_path_rate: float = 0.0  # stochastic depth (ref swin.py:283-458)
    drop_rate: float = 0.0  # proj/FFN dropout
    attn_drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x [B, H, W, C] (H, W multiples of window_size via padding)."""
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        x = TorchLayerNorm(name="norm1")(x)
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        shift = ws // 2 if self.shift else 0
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))

        def to_windows(t):
            t = t.reshape(b, hp // ws, ws, wp // ws, ws, c)
            return t.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)

        def from_windows(t):
            t = t.reshape(b, hp // ws, wp // ws, ws, ws, c)
            return t.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)

        if shift:
            # additive attention mask for the wrapped windows
            img_mask = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            m = img_mask.reshape(1, hp // ws, ws, wp // ws, ws, 1)
            m = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
            attn_mask = np.where(m[:, None, :] != m[:, :, None], -100.0, 0.0)
            attn_mask = jnp.asarray(attn_mask.astype(np.float32))
        else:
            attn_mask = None
        y = WindowMSA(
            c,
            self.num_heads,
            ws,
            attn_drop_rate=self.attn_drop_rate,
            proj_drop_rate=self.drop_rate,
            name="attn",
        )(to_windows(x), attn_mask, train)
        x = from_windows(y)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w]
        x = shortcut + DropPath(self.drop_path_rate, name="drop_path1")(x, train)
        y = TorchLayerNorm(name="norm2")(x)
        y = nn.Dense(4 * c, name="fc1")(y)
        # exact erf GELU: torch nn.GELU default (jax defaults to tanh approx)
        y = nn.Dropout(self.drop_rate, deterministic=not train)(
            nn.gelu(y, approximate=False)
        )
        y = nn.Dense(c, name="fc2")(y)
        y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        return x + DropPath(self.drop_path_rate, name="drop_path2")(y, train)


class PatchMerging(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        pad_h, pad_w = h % 2, w % 2
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = TorchLayerNorm(name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    embed_dims: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    # 0 -> drop_path_rate linear ramp across all blocks, matching the
    # reference (swin.py:538-541; ++ config sets 0.2)
    drop_path_rate: float = 0.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        x = nn.Conv(self.embed_dims, (4, 4), (4, 4), padding="VALID", name="patch_embed")(x)
        x = TorchLayerNorm(name="patch_norm")(x)
        outs = []
        dim = self.embed_dims
        total = sum(self.depths)
        dprs = [
            self.drop_path_rate * k / max(total - 1, 1) for k in range(total)
        ]
        blk = 0
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for j in range(depth):
                x = SwinBlock(
                    dim,
                    heads,
                    self.window_size,
                    shift=j % 2 == 1,
                    drop_path_rate=dprs[blk],
                    drop_rate=self.drop_rate,
                    attn_drop_rate=self.attn_drop_rate,
                    name=f"stage{i}_block{j}",
                )(x, train)
                blk += 1
            if i in self.out_indices:
                outs.append(TorchLayerNorm(name=f"out_norm{i}")(x))
            if i < len(self.depths) - 1:
                x = PatchMerging(dim * 2, name=f"merge{i}")(x)
                dim *= 2
        return outs
