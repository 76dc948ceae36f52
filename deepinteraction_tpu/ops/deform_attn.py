"""Multi-scale deformable attention (mmcv ``MultiScaleDeformableAttention``).

The reference uses the CUDA MSDA kernel as the intra-modal "self_attn" of
the ++ fusion layers and inside MMRI_P2I (config Fusion_0075_plusplus.py:
222-248, fusion_transformerv4.py:226). With only heads x levels x 4 samples
per query, a gather + bilinear-interp formulation is MXU/VPU-friendly on
TPU — no custom kernel needed (SURVEY §2.3).

Semantics matched to mmcv:
- sampling location = ref + offset / (W_l, H_l), in [0, 1] normalized coords;
- bilinear sample with zero padding, align_corners=False;
- attention weights softmax over (levels x points) jointly;
- output projection, then residual ``identity + dropout(out)``;
- sampling-offset bias initialized to the rotated unit-grid pattern.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.geometry import (
    _patch_cells,
    build_patch_table_flat,
    combine_flat_cells,
    grid_sample_2d_views_patch_flat_psum,
)

# Eval-time sample-point reduction: keep only the top-k attention-weighted
# points per (query, head, level) and renormalize. The sampling gathers are
# index-rate-bound on TPU (~11 ns/row, PERF.md), so k of p cuts that bucket
# by p/k. 0 = off (exact reference math). Training always uses all points.
# Selection uses one-hot matmuls over the tiny p axis — take_along_axis
# would re-introduce as many gather indices as it saves (PERF.md pitfall).
#
# Default 2: quality-gated (PERF.md round 3) — per-level k=2 matched exact
# sampling on trained AND unseen synthetic roots (mAP delta 0.0000, NDS
# -0.0001), standalone and combined with joint k=4. Where the joint lever
# engages (l*p > kj, e.g. ++ self_attn) it takes precedence and this knob
# is ignored; it bites on MMRI_P2I (l=1, p=4 -> top-2). 0 = strict parity
# (pinned in tests/conftest.py).
MSDA_EVAL_POINTS = int(os.environ.get("DI_MSDA_EVAL_POINTS", "2"))

# Joint variant: keep the top-k over the FULL (levels x points) candidate
# set per (query, head) — strictly better selection than k-per-level at the
# same gather budget (the softmax is already joint over l*p, mmcv
# semantics). Routes every kept point through ONE concatenated multi-level
# patch table, so the level loop collapses into a single gather. 0 = off.
# Mutually exclusive with DI_MSDA_EVAL_POINTS (joint wins if both set).
#
# Default 4: quality-gated on the synthetic-overfit protocol (PERF.md
# round 3) — joint k=4 matches exact sampling on trained AND unseen scenes
# (mAP delta +0.001/-0.000, NDS +0.0006/+0.0001) while halving the ++
# self_attn sampling gathers (k=4 of l*p=8); k=2 degraded trained-scene
# mAP by 0.032 and is NOT safe. P2I (l*p=4) is untouched at kj=4 (the
# joint path only engages when kj < l*p). Training always uses all points;
# DI_MSDA_JOINT_POINTS=0 restores strict reference math at eval (pinned in
# tests/conftest.py so golden fixtures stay in parity mode).
MSDA_JOINT_POINTS = int(os.environ.get("DI_MSDA_JOINT_POINTS", "4"))

# Heads-major value projection: write the value grid directly in the
# [B, h, HW, hd] layout the patch-table build wants, via one einsum on the
# MXU, instead of projecting to [B, HW, h*hd] and transposing (the strided
# [hh,ww,h,hd] -> heads-major relayout measured 15.4 ms/call at ~71 GB/s in
# the ++ trace — 92 ms across the 6 MSDA calls, PERF.md round 3). Same
# contraction, same params — numerics identical up to dot reassociation.
MSDA_HEADS_MAJOR = os.environ.get("DI_MSDA_HEADS_MAJOR", "0") == "1"


def topk_points(offsets: jnp.ndarray, weights: jnp.ndarray, k: int):
    """Keep the k highest-weight sampling points per (query, head, level).

    offsets [..., l, p, 2], weights [..., l, p] (softmaxed jointly over
    l*p). Returns ([..., l, k, 2], [..., l, k]) with the kept weights
    renormalized to sum to 1 over (l, k). Pure one-hot matmuls — no
    gather indices.
    """
    p = weights.shape[-1]
    topv, topi = jax.lax.top_k(weights, k)  # [..., l, k]
    sel = (topi[..., None] == jnp.arange(p)).astype(offsets.dtype)
    off_k = jnp.einsum("...kp,...pc->...kc", sel, offsets)
    w_k = topv / jnp.sum(topv, axis=(-2, -1), keepdims=True)
    return off_k, w_k


def joint_topk_sample(
    v: jnp.ndarray,  # [B, Nv, h*hd], or [B, h, Nv, hd] if heads_major
    offsets: jnp.ndarray,  # [B, Nq, h, L, P, 2]
    weights: jnp.ndarray,  # [B, Nq, h, L, P], softmaxed jointly over L*P
    reference_points: jnp.ndarray,  # [B, Nq, L, 2] in [0, 1]
    spatial_shapes,  # static [(H_l, W_l)]
    kj: int,
    heads_major: bool = False,
) -> jnp.ndarray:
    """Joint top-k MSDA sampling: keep the kj highest-weight points over the
    FULL (levels x points) candidate set per (query, head), renormalized.

    All levels' 2x2-patch tables are concatenated into ONE flat table with
    per-level row offsets, so the kept points — whatever level they landed
    on — ride a single gather of kj rows per (query, head) instead of L
    per-level gathers of P rows each. Selection is one-hot matmuls over the
    tiny L*P axis (exact: row ids < 2^24 are integers in f32).

    Same candidate geometry and zero-padding semantics as the exact path
    (shared ``_patch_cells``); only which points are kept differs. Returns
    [B, Nq, h, hd].
    """
    b, nq, h, l, p, _ = offsets.shape
    hd = v.shape[-1] if heads_major else v.shape[-1] // h
    sizes = [hh * ww for hh, ww in spatial_shapes]
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    tables, bases, cellws = [], [], []
    row_offset = 0
    for li, (hh, ww) in enumerate(spatial_shapes):
        if heads_major:
            vb = v[:, :, starts[li] : starts[li] + sizes[li]].reshape(
                b, h, hh, ww, hd
            )
        else:
            v_l = v[:, starts[li] : starts[li] + sizes[li]].reshape(b, hh, ww, h, hd)
            vb = jnp.transpose(v_l, (0, 3, 1, 2, 4))  # [B, h, hh, ww, hd]
        tables.append(jax.vmap(build_patch_table_flat)(vb))  # [B, h*hh*ww, 4hd]
        wh = jnp.asarray([ww, hh], v.dtype)
        loc = reference_points[:, :, None, li, None, :] + offsets[:, :, :, li] / wh
        grid = loc * 2.0 - 1.0  # [B, Nq, h, P, 2]
        hidx = jnp.broadcast_to(
            jnp.arange(h, dtype=jnp.int32)[None, None, :, None], grid.shape[:-1]
        )
        base, w4 = _patch_cells((h, hh, ww), grid, hidx, False)
        bases.append(base + row_offset)
        cellws.append(jnp.stack(w4, -1))  # [B, Nq, h, P, 4]
        row_offset += h * hh * ww
    flat_table = jnp.concatenate(tables, axis=1)  # [B, sum_l h*H*W, 4hd]
    base_all = jnp.stack(bases, 3).reshape(b, nq, h, l * p)
    w4_all = jnp.stack(cellws, 3).reshape(b, nq, h, l * p, 4)

    topv, topi = jax.lax.top_k(weights.reshape(b, nq, h, l * p), kj)
    sel = (topi[..., None] == jnp.arange(l * p)).astype(jnp.float32)
    base_k = jnp.einsum("...kq,...q->...k", sel, base_all.astype(jnp.float32))
    base_k = jnp.round(base_k).astype(jnp.int32)
    w4_k = jnp.einsum("...kq,...qc->...kc", sel.astype(w4_all.dtype), w4_all)
    wk = topv / jnp.sum(topv, axis=-1, keepdims=True)

    g = jax.vmap(lambda tb, ix: tb[ix])(flat_table, base_k.reshape(b, -1))
    # combine in the FLAT [R, 4*hd] gather layout: fold the point weight
    # into the 4 cell weights — reshaping the gather output to
    # [.., kj, 4, hd] first costs a full T(4,128) relayout of the 1.1 GB
    # tensor (measured 35 + 50 ms per ++ frame, PERF.md round 4); row-dim
    # splits after the combine are layout-free. Combine form (lane slices
    # vs mask-matmul) selected by DI_MSDA_COMBINE (geometry.py).
    wc = (w4_k * wk[..., None]).reshape(b, -1, 4)  # [B, R, 4]
    acc = combine_flat_cells(g, wc, hd)  # [B, R, hd]
    return jnp.sum(acc.reshape(b, nq, h, kj, hd), axis=3)  # [B, Nq, h, hd]


class _LinearParams(nn.Module):
    """kernel/bias with the exact param tree of an ``nn.Dense`` (so torch
    checkpoint conversion and existing orbax checkpoints are unaffected),
    exposed raw so the projection can be computed in either layout."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


def _offset_bias_init(num_heads: int, num_levels: int, num_points: int):
    thetas = np.arange(num_heads) * (2.0 * np.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [H, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    grid = grid * (np.arange(1, num_points + 1)[None, None, :, None])
    return grid.reshape(-1).astype(np.float32)


class MSDeformableAttention(nn.Module):
    embed_dims: int
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Nq, C]
        value: jnp.ndarray,  # [B, Nv, C] flattened levels
        reference_points: jnp.ndarray,  # [B, Nq, L, 2] in [0, 1]
        spatial_shapes: Sequence[Tuple[int, int]],  # static (H_l, W_l)
        identity: jnp.ndarray | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        c, h, l, p = self.embed_dims, self.num_heads, self.num_levels, self.num_points
        hd = c // h
        b, nq = query.shape[0], query.shape[1]
        assert len(spatial_shapes) == l

        vk, vbias = _LinearParams(value.shape[-1], c, name="value_proj")()
        heads_major = MSDA_HEADS_MAJOR and not train
        if heads_major:
            # [B, h, Nv, hd] straight off the MXU — no strided relayout.
            v = jnp.einsum(
                "bpc,chd->bhpd", value, vk.reshape(-1, h, hd)
            ) + vbias.reshape(h, 1, hd)
        else:
            v = jnp.dot(value, vk) + vbias
        offsets = nn.Dense(
            2 * h * l * p,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: jnp.asarray(_offset_bias_init(h, l, p)),
            name="sampling_offsets",
        )(query).reshape(b, nq, h, l, p, 2)
        weights = nn.Dense(
            h * l * p, kernel_init=nn.initializers.zeros, name="attention_weights"
        )(query).reshape(b, nq, h, l * p)
        weights = jax.nn.softmax(weights, axis=-1).reshape(b, nq, h, l, p)

        kj = MSDA_JOINT_POINTS
        if not train and 0 < kj < l * p:
            out = joint_topk_sample(
                v, offsets, weights, reference_points, spatial_shapes, kj,
                heads_major=heads_major,
            )
            out = nn.Dense(c, name="output_proj")(out.reshape(b, nq, c))
            identity = query if identity is None else identity
            return identity + out

        k = MSDA_EVAL_POINTS
        if not train and 0 < k < p:
            offsets, weights = topk_points(offsets, weights, k)
            p = k

        sizes = [hh * ww for hh, ww in spatial_shapes]
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        out = jnp.zeros((b, nq, h, hd), query.dtype)
        for li, (hh, ww) in enumerate(spatial_shapes):
            if heads_major:
                vb_l = v[:, :, starts[li] : starts[li] + sizes[li]].reshape(
                    b, h, hh, ww, hd
                )
            else:
                v_l = v[:, starts[li] : starts[li] + sizes[li]].reshape(
                    b, hh, ww, h, hd
                )
                # heads-major for the flat patch table (relayout; see
                # DI_MSDA_HEADS_MAJOR above for the transpose-free variant)
                vb_l = jnp.transpose(v_l, (0, 3, 1, 2, 4))
            wh = jnp.asarray([ww, hh], query.dtype)
            loc = reference_points[:, :, None, li, None, :] + offsets[:, :, :, li] / wh
            grid = loc * 2.0 - 1.0  # [B, Nq, h, p, 2]

            # (batch, head) pairs act as "views" of ONE flat 2x2-patch
            # table: all 4 bilinear taps of a (query, head, point) arrive
            # in one [4*hd]-lane row gather — measured 3.7x faster than
            # per-head 4-tap gathers at hd=16 (PERF.md round 2). Batch is
            # folded into the view axis (row-offset keys) instead of
            # vmapping, so the backward runs ONE flat sort, not b batched
            # sorts (the repo's flat-sort rule). The point sum rides
            # INSIDE the fused psum op: its custom chunked backward
            # replaces XLA's serialized scatter-add gather transpose (48%
            # of the ++ train step) without materializing full-R temps
            # (PERF.md round 5). The point weight folds into the [R, 4]
            # cell weights — same sum up to fp reassociation; this
            # replaces the broadcast-multiply over the lane-padded
            # [.., p, hd] sampled tensor (36 ms/frame in the round-4 ++
            # eval trace and five 2.05 GB padded train-backward temps).
            table = build_patch_table_flat(vb_l.reshape(b * h, hh, ww, hd))
            bhidx = (
                jnp.arange(b, dtype=jnp.int32)[:, None, None, None] * h
                + jnp.arange(h, dtype=jnp.int32)[None, None, :, None]
            )
            bhidx = jnp.broadcast_to(bhidx, grid.shape[:-1])
            out = out + grid_sample_2d_views_patch_flat_psum(
                table, (b * h, hh, ww), grid, bhidx, weights[:, :, :, li]
            )

        out = nn.Dense(c, name="output_proj")(out.reshape(b, nq, c))
        if self.dropout > 0.0 and train:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, out.shape)
            out = out * keep / (1.0 - self.dropout)
        identity = query if identity is None else identity
        return identity + out
