"""Sparse 3D middle encoder (mmdet3d ``SparseEncoder`` rebuilt on the COO ops).

Reference topology (config Fusion_0075_refactor.py:160-168, block_type
'basicblock', channels ((16,16,32),(32,32,64),(64,64,128),(128,128))):

    conv_input: SubM(5->16) + BN + ReLU
    stage0: Basic(16) Basic(16) SparseConv s2 16->32  (pad 1)
    stage1: Basic(32) Basic(32) SparseConv s2 32->64  (pad 1)
    stage2: Basic(64) Basic(64) SparseConv s2 64->128 (pad z0 y1 x1)
    stage3: Basic(128) Basic(128)
    conv_out: SparseConv k(3,1,1) s(2,1,1) pad 0, 128->128 + BN + ReLU
    -> dense BEV [ny/8, nx/8, 128*2]

TPU design notes:
- one submanifold neighbor table per stage (shared by every SubM conv in the
  stage), built with sorted-id binary search — per sample, vmapped.
- BatchNorm statistics span ALL samples' active voxels (torch BN1d over the
  concatenated voxel list), hence masked BN outside the vmap.
- static per-stage capacities come from config.stage_capacities.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import SparseEncoderConfig
from ..ops import sparse_conv as sc
from .layers import MaskedBatchNorm

BN_MOM = 0.01  # torch momentum (mmdet3d SparseEncoder default)
BN_EPS = 1e-3


def _vmap_subm_table(coords, valid, shape, kernel=(3, 3, 3)):
    def one(c, v):
        st = sc.SparseTensor(jnp.zeros((c.shape[0], 1)), c, v, shape)
        return sc.subm_neighbor_table(st, kernel)

    return jax.vmap(one)(coords, valid)


class _SubMConvBNReLU(nn.Module):
    cin: int
    cout: int
    taps: int = 27

    @nn.compact
    def __call__(self, feats, nbr, valid, train: bool):
        w = self.param(
            "w",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (self.taps, self.cin, self.cout),
        )
        out = jax.vmap(lambda f, n, v: sc.gathered_matmul(f, n, w, v))(
            feats, nbr, valid
        )
        out = MaskedBatchNorm(momentum=BN_MOM, epsilon=BN_EPS, name="bn")(
            out, valid, train
        )
        return nn.relu(out)


class _SparseBasicBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, feats, nbr, valid, train: bool):
        w1 = self.param(
            "w1",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (27, self.ch, self.ch),
        )
        w2 = self.param(
            "w2",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (27, self.ch, self.ch),
        )
        y = jax.vmap(lambda f, n, v: sc.gathered_matmul(f, n, w1, v))(
            feats, nbr, valid
        )
        y = MaskedBatchNorm(momentum=BN_MOM, epsilon=BN_EPS, name="bn1")(y, valid, train)
        y = nn.relu(y)
        y = jax.vmap(lambda f, n, v: sc.gathered_matmul(f, n, w2, v))(
            y, nbr, valid
        )
        y = MaskedBatchNorm(momentum=BN_MOM, epsilon=BN_EPS, name="bn2")(y, valid, train)
        return nn.relu(y + feats)


class SparseEncoder(nn.Module):
    cfg: SparseEncoderConfig

    @nn.compact
    def __call__(self, voxel_feats, coords, valid, train: bool = False):
        """voxel_feats [B,K,Cin], coords [B,K,3] (z,y,x sorted by id),
        valid [B,K] -> BEV [B, ny/8, nx/8, 2*output_channels]."""
        cfg = self.cfg
        shape = tuple(cfg.sparse_shape)
        caps = cfg.stage_capacities

        nbr = _vmap_subm_table(coords, valid, shape)
        feats = _SubMConvBNReLU(cfg.in_channels, cfg.base_channels, name="conv_input")(
            voxel_feats, nbr, valid, train
        )

        stage_specs = cfg.encoder_channels
        strided_pads = [(1, 1, 1), (1, 1, 1), (0, 1, 1)]
        cur_shape = shape
        for i, blocks in enumerate(stage_specs):
            ch = blocks[0]
            n_basic = len(blocks) - 1 if i < len(stage_specs) - 1 else len(blocks)
            for j in range(n_basic):
                feats = _SparseBasicBlock(ch, name=f"stage{i}_block{j}")(
                    feats, nbr, valid, train
                )
            if i < len(stage_specs) - 1:
                cout = blocks[-1]
                w = self.param(
                    f"down{i}_w",
                    nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                    (27, ch, cout),
                )
                pad = strided_pads[i]

                def one_down(f, c, v, w=w, pad=pad, cur_shape=cur_shape, cap=caps[i + 1]):
                    st = sc.SparseTensor(f, c, v, cur_shape)
                    out = sc.sparse_conv_downsample(
                        st, w, None, (3, 3, 3), (2, 2, 2), pad, cap
                    )
                    return out.features, out.coords, out.valid

                feats, coords, valid = jax.vmap(one_down)(feats, coords, valid)
                cur_shape = tuple(
                    (cur_shape[d] + 2 * pad[d] - 3) // 2 + 1 for d in range(3)
                )
                feats = MaskedBatchNorm(
                    momentum=BN_MOM, epsilon=BN_EPS, name=f"down{i}_bn"
                )(feats, valid, train)
                feats = nn.relu(feats)
                nbr = _vmap_subm_table(coords, valid, cur_shape)

        # conv_out: k (3,1,1) s (2,1,1) pad 0
        w_out = self.param(
            "conv_out_w",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (3, stage_specs[-1][-1], cfg.output_channels),
        )

        def one_out(f, c, v, cur_shape=cur_shape):
            st = sc.SparseTensor(f, c, v, cur_shape)
            out = sc.sparse_conv_downsample(
                st, w_out, None, (3, 1, 1), (2, 1, 1), (0, 0, 0), f.shape[0]
            )
            return out.features, out.coords, out.valid

        feats, coords, valid = jax.vmap(one_out)(feats, coords, valid)
        out_shape = ((cur_shape[0] - 3) // 2 + 1, cur_shape[1], cur_shape[2])
        feats = MaskedBatchNorm(momentum=BN_MOM, epsilon=BN_EPS, name="conv_out_bn")(
            feats, valid, train
        )
        feats = nn.relu(feats)

        def one_dense(f, c, v):
            st = sc.SparseTensor(f, c, v, out_shape)
            return sc.to_dense_bev(st)

        return jax.vmap(one_dense)(feats, coords, valid)
