"""Sparse 3D middle encoder (mmdet3d ``SparseEncoder`` rebuilt on TPU ops).

Reference topology (config Fusion_0075_refactor.py:160-168, block_type
'basicblock', channels ((16,16,32),(32,32,64),(64,64,128),(128,128))):

    conv_input: SubM(5->16) + BN + ReLU
    stage0: Basic(16) Basic(16) SparseConv s2 16->32  (pad 1)
    stage1: Basic(32) Basic(32) SparseConv s2 32->64  (pad 1)
    stage2: Basic(64) Basic(64) SparseConv s2 64->128 (pad z0 y1 x1)
    stage3: Basic(128) Basic(128)
    conv_out: SparseConv k(3,1,1) s(2,1,1) pad 0, 128->128 + BN + ReLU
    -> dense BEV [ny/8, nx/8, 128*2]

Two interchangeable implementations (same parameters, same math), selected
with env ``DI_SPARSE_IMPL``:

- ``dense`` (default): submanifold conv == dense conv3d over a zero-filled
  grid read back at the active sites — inactive sites are zero so they
  contribute nothing. Replaces 27-way row gathers (element-rate-bound on
  TPU, measured ~100x below HBM bandwidth) with MXU-native convolutions +
  one scatter/gather pair per conv. Costs the dense grid in HBM
  (5.4 GB fp32 at stage 0, eval capacity) — a memory-for-speed trade.
- ``gather``: fixed-capacity COO with dense-index-map neighbor tables and
  one fused [K, 27*Cin] x [27*Cin, Cout] matmul per conv. Flat, low-memory
  profile for training at larger batches.

TPU design notes:
- BatchNorm statistics span ALL samples' active voxels (torch BN1d over the
  concatenated voxel list), hence masked BN outside the vmap.
- static per-stage capacities come from config.stage_capacities.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import SparseEncoderConfig
from ..ops import sparse_conv as sc
from ..ops import sparse_conv_banded as scb
from .layers import MaskedBatchNorm

BN_MOM = 0.01  # torch momentum (mmdet3d SparseEncoder default)
BN_EPS = 1e-3

# 'banded' = Pallas banded one-hot gather-matmul kernel (sparse_conv_banded),
# measured 1.3-2.7x the XLA 'gather' path per conv on v5e at all stage
# shapes. Interpreted (slow) off-TPU, so tests/CPU default to 'gather'.
SPARSE_IMPL = os.environ.get("DI_SPARSE_IMPL", "banded")
BANDED_T = int(os.environ.get("DI_BANDED_T", "128"))
# Window width; kernel cost is ~linear in W. Accepts one value or a
# comma-separated per-stage list ("512,384,320,256") — deeper stages have
# smaller index spreads, so narrower windows stay overflow-free there.
_BANDED_WS = [int(x) for x in os.environ.get("DI_BANDED_W", "512").split(",")]


def banded_w(stage_idx: int) -> int:
    return _BANDED_WS[min(stage_idx, len(_BANDED_WS) - 1)]


def _resolve_impl(impl: str) -> str:
    if impl == "banded" and jax.default_backend() != "tpu":
        return "gather"
    return impl


def _vmap_subm_table(coords, valid, shape, kernel=(3, 3, 3)):
    def one(c, v):
        st = sc.SparseTensor(jnp.zeros((c.shape[0], 1)), c, v, shape)
        return sc.subm_neighbor_table(st, kernel)

    return jax.vmap(one)(coords, valid)


class _Stage:
    """Per-stage conv executor over [B, K, C] features with static
    coords/valid/shape; hides the gather-vs-dense choice.

    'dense' auto-degrades to 'gather' when the stage's dense grid would be
    too large: TPU convolutions pad the channel dim to 128 lanes, so a
    41x1440x1440 grid costs 128-lane x 4 B per cell (~43 GB) regardless of
    the real channel count — only the downsampled stages fit.
    """

    DENSE_BYTE_LIMIT = 900e6

    def __init__(self, coords, valid, shape, impl: str, stage_idx: int = 0):
        impl = _resolve_impl(impl)
        if impl == "dense":
            padded_bytes = shape[0] * shape[1] * shape[2] * 128 * 4
            if padded_bytes > self.DENSE_BYTE_LIMIT:
                impl = "gather"
        self.coords, self.valid, self.shape, self.impl = coords, valid, shape, impl
        self.W = banded_w(stage_idx)
        self.nbr = (
            _vmap_subm_table(coords, valid, shape)
            if impl in ("gather", "sgather", "banded")
            else None
        )
        if impl == "banded":
            self.plan = jax.vmap(
                lambda n, v: scb.make_banded_plan(n, v, T=BANDED_T, W=self.W)
            )(self.nbr, valid)

    def subm(self, x, w):
        if self.impl == "banded":
            outs = [
                scb.banded_subm_conv(
                    BANDED_T,
                    self.W,
                    False,
                    x[b],
                    w,
                    self.valid[b],
                    self.nbr[b],
                    jax.tree_util.tree_map(lambda a: a[b], self.plan),
                )
                for b in range(x.shape[0])
            ]
            return jnp.stack(outs)
        if self.impl == "sgather":
            return jax.vmap(lambda f, n, v: sc.slice_gathered_matmul(f, n, w, v))(
                x, self.nbr, self.valid
            )
        if self.impl == "gather":
            return jax.vmap(lambda f, n, v: sc.gathered_matmul(f, n, w, v))(
                x, self.nbr, self.valid
            )
        if self.impl == "s2d":
            return jax.vmap(
                lambda f, c, v: sc.subm_conv_s2d(
                    sc.SparseTensor(f, c, v, self.shape), w
                )
            )(x, self.coords, self.valid)
        return jax.vmap(
            lambda f, c, v: sc.subm_conv_dense(sc.SparseTensor(f, c, v, self.shape), w)
        )(x, self.coords, self.valid)

    def down(self, x, w, kernel, stride, padding, capacity):
        if self.impl in ("gather", "sgather", "s2d", "banded"):
            # site generation uses ONE flat sort across the batch (a
            # batched [B, 8K] sort lowers ~4x slower on TPU; sparse_conv.
            # downsample_sites_batched)
            ocoords, ovalid, oshape = sc.downsample_sites_batched(
                self.coords, self.valid, self.shape, kernel, stride,
                padding, capacity,
            )

            # slice form needs x-fastest groups of 3 consecutive ids —
            # only valid when the kernel's x extent is 3 (the (3,1,1)
            # z-downsample taps are ny*nx apart, not consecutive)
            use_slice = self.impl == "sgather" and kernel[2] == 3

            def one(f, c, v, oc, ov):
                st = sc.SparseTensor(f, c, v, self.shape)
                nbr = sc.strided_neighbor_table(
                    st, oc, ov, kernel, stride, padding
                )
                if use_slice:
                    return sc.slice_gathered_matmul(f, nbr, w, ov)
                return sc.gathered_matmul(f, nbr, w.reshape(-1, w.shape[-1]), ov)

            feats = jax.vmap(one)(x, self.coords, self.valid, ocoords, ovalid)
            return feats, ocoords, ovalid

        def one(f, c, v):
            st = sc.SparseTensor(f, c, v, self.shape)
            out = sc.strided_conv_dense(st, w, kernel, stride, padding, capacity)
            return out.features, out.coords, out.valid

        return jax.vmap(one)(x, self.coords, self.valid)


class _SubMConvBNReLU(nn.Module):
    cin: int
    cout: int

    @nn.compact
    def __call__(self, x, stage: _Stage, train: bool):
        w = self.param(
            "w",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (27, self.cin, self.cout),
        )
        out = stage.subm(x, w)
        out = MaskedBatchNorm(momentum=BN_MOM, epsilon=BN_EPS, name="bn")(
            out, stage.valid, train
        )
        return nn.relu(out)


class _SparseBasicBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, stage: _Stage, train: bool):
        init = nn.initializers.variance_scaling(1.0, "fan_in", "normal")
        w1 = self.param("w1", init, (27, self.ch, self.ch))
        w2 = self.param("w2", init, (27, self.ch, self.ch))
        y = stage.subm(x, w1)
        y = MaskedBatchNorm(momentum=BN_MOM, epsilon=BN_EPS, name="bn1")(
            y, stage.valid, train
        )
        y = nn.relu(y)
        y = stage.subm(y, w2)
        y = MaskedBatchNorm(momentum=BN_MOM, epsilon=BN_EPS, name="bn2")(
            y, stage.valid, train
        )
        return nn.relu(y + x)


class SparseEncoder(nn.Module):
    cfg: SparseEncoderConfig
    impl: str = SPARSE_IMPL

    @nn.compact
    def __call__(self, voxel_feats, coords, valid, train: bool = False):
        """voxel_feats [B,K,Cin], coords [B,K,3] (z,y,x sorted by id),
        valid [B,K] -> BEV [B, ny/8, nx/8, 2*output_channels]."""
        cfg = self.cfg
        shape = tuple(cfg.sparse_shape)
        caps = cfg.stage_capacities
        w_init = nn.initializers.variance_scaling(1.0, "fan_in", "normal")

        # Training defaults to the gather path: the banded kernel's round-2
        # backward materialized [K, 27, Cin] per conv for d/dW and pushed
        # the full-size fwd+bwd graph over HBM on a 16 GB chip (measured
        # RESOURCE_EXHAUSTED; the gather train step fits at 2.1 s/step).
        # The backward is now tap-looped with bf16 residuals
        # (sparse_conv_banded._banded_bwd); DI_SPARSE_TRAIN_IMPL=banded
        # opts train graphs back in. Eval keeps the banded kernel.
        if train and self.impl == "banded":
            impl = os.environ.get("DI_SPARSE_TRAIN_IMPL", "gather")
        else:
            impl = self.impl
        stage = _Stage(coords, valid, shape, impl, stage_idx=0)
        feats = _SubMConvBNReLU(cfg.in_channels, cfg.base_channels, name="conv_input")(
            voxel_feats, stage, train
        )

        stage_specs = cfg.encoder_channels
        strided_pads = [(1, 1, 1), (1, 1, 1), (0, 1, 1)]
        cur_shape = shape
        for i, blocks in enumerate(stage_specs):
            ch = blocks[0]
            n_basic = len(blocks) - 1 if i < len(stage_specs) - 1 else len(blocks)
            for j in range(n_basic):
                feats = _SparseBasicBlock(ch, name=f"stage{i}_block{j}")(
                    feats, stage, train
                )
            if i < len(stage_specs) - 1:
                cout = blocks[-1]
                w = self.param(f"down{i}_w", w_init, (27, ch, cout))
                pad = strided_pads[i]
                feats, coords, valid = stage.down(
                    feats, w, (3, 3, 3), (2, 2, 2), pad, caps[i + 1]
                )
                cur_shape = tuple(
                    (cur_shape[d] + 2 * pad[d] - 3) // 2 + 1 for d in range(3)
                )
                feats = MaskedBatchNorm(
                    momentum=BN_MOM, epsilon=BN_EPS, name=f"down{i}_bn"
                )(feats, valid, train)
                feats = nn.relu(feats)
                stage = _Stage(coords, valid, cur_shape, impl, stage_idx=i + 1)

        # conv_out: k (3,1,1) s (2,1,1) pad 0
        w_out = self.param(
            "conv_out_w", w_init, (3, stage_specs[-1][-1], cfg.output_channels)
        )
        feats, coords, valid = stage.down(
            feats, w_out, (3, 1, 1), (2, 1, 1), (0, 0, 0), feats.shape[1]
        )
        out_shape = ((cur_shape[0] - 3) // 2 + 1, cur_shape[1], cur_shape[2])
        feats = MaskedBatchNorm(momentum=BN_MOM, epsilon=BN_EPS, name="conv_out_bn")(
            feats, valid, train
        )
        feats = nn.relu(feats)

        def one_dense(f, c, v):
            st = sc.SparseTensor(f, c, v, out_shape)
            return sc.to_dense_bev(st)

        return jax.vmap(one_dense)(feats, coords, valid)
