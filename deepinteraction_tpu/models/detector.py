"""DeepInteraction detector: full camera+LiDAR forward graph, one jit.

Reference: models/detectors/deepinteraction.py. The whole forward —
dual voxelization, sparse middle encoder, image backbone, MMRI fusion,
MMPI decoding — is a single static-shape XLA graph with zero host
round-trips (the reference crosses the device boundary for depth completion
and voxelization ordering).

Expected batch dict (all arrays, static shapes):
    points [B, N, 5] float32 (padded), points_mask [B, N] bool
    images [B, V, H, W, 3] float32 (host-normalized)
    lidar2img [B, V, 4, 4], img2lidar [B, V, 4, 4]
    lidar_aug [B, 4, 4], lidar_aug_inv [B, 4, 4]
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import ModelConfig
from ..ops.voxelize import hard_simple_vfe, voxelize_batched
from .decoder import Decoder
from .fpn import FPN
from .fusion_transformer import FusionTransformerPP
from .mmri_encoder import MMRIEncoder
from .resnet import ResNet
from .second import SECOND, SECONDFPN
from .sparse_encoder import SparseEncoder
from .swin import SwinTransformer


class DeepInteraction(nn.Module):
    cfg: ModelConfig
    input_shape: tuple  # padded camera (H, W)
    num_proposals: int | None = None  # override for test-time 400

    @nn.compact
    def __call__(
        self, batch: Dict[str, Any], train: bool = False, encoder_only: bool = False
    ):
        """``encoder_only=True`` stops after the MMRI fusion and returns
        (new_img, (pts_conv, new_pts)) — the split-program probe for the
        Pallas-in-train crash bisection (tools/repro/locatt_train_crash.py
        stage 6: a train-scale fwd+bwd program WITHOUT the decoder half)."""
        cfg = self.cfg
        if cfg.lidar_only:
            return self._lidar_only(batch, train)
        b, v = batch["images"].shape[0], batch["images"].shape[1]

        # DI_DENSE_BF16=1 (eval only): run the dense conv backbones/necks
        # with bf16 activations (params stay f32, outputs cast back). The
        # MXU already multiplies at bf16 by default — this halves the
        # activation HBM traffic these stages are actually bound by.
        # Quality-gated deviation; default off (strict f32 parity).
        dense_dt = (
            jnp.bfloat16
            if (not train and os.environ.get("DI_DENSE_BF16", "0") == "1")
            else None
        )

        # ---- image branch (frozen in the shipped configs) ----
        imgs = batch["images"].reshape((b * v,) + batch["images"].shape[2:])
        if cfg.img_backbone.type == "resnet":
            feats = ResNet(
                depth=cfg.img_backbone.depth,
                out_indices=cfg.img_backbone.out_indices,
                dtype=dense_dt,
                name="img_backbone",
            )(imgs, train=train and cfg.img_backbone.frozen_stages < 0)
        else:
            feats = SwinTransformer(
                embed_dims=cfg.img_backbone.embed_dims,
                depths=cfg.img_backbone.depths,
                num_heads=cfg.img_backbone.num_heads,
                window_size=cfg.img_backbone.window_size,
                out_indices=cfg.img_backbone.out_indices,
                drop_path_rate=cfg.img_backbone.drop_path_rate,
                drop_rate=cfg.img_backbone.drop_rate,
                attn_drop_rate=cfg.img_backbone.attn_drop_rate,
                name="img_backbone",
            )(imgs, train=train and cfg.img_backbone.frozen_stages < 0)
        fpn_feats = FPN(
            out_channels=cfg.img_neck.out_channels,
            num_outs=cfg.img_neck.num_outs,
            dtype=dense_dt,
            name="img_neck",
        )(feats, train)
        if dense_dt is not None:
            fpn_feats = [f.astype(jnp.float32) for f in fpn_feats]
        unflat = lambda x: x.reshape((b, v) + x.shape[1:])
        img_feats = unflat(fpn_feats[0])

        # ---- LiDAR branch ----
        vl = cfg.pts_voxel_layer
        max_vox = vl.max_voxels[0] if train else vl.max_voxels[1]

        vo = voxelize_batched(
            batch["points"],
            batch["points_mask"],
            voxel_size=vl.voxel_size,
            point_cloud_range=vl.point_cloud_range,
            max_num_points=vl.max_num_points,
            max_voxels=max_vox,
        )
        vfeats = jax.vmap(hard_simple_vfe)(vo.voxels, vo.num_points)
        vvalid = jnp.arange(max_vox)[None, :] < vo.num_voxels[:, None]
        bev = SparseEncoder(cfg.pts_middle_encoder, name="pts_middle_encoder")(
            vfeats, vo.coords, vvalid, train
        )
        sec = SECOND(
            out_channels=cfg.pts_backbone.out_channels,
            layer_nums=cfg.pts_backbone.layer_nums,
            layer_strides=cfg.pts_backbone.layer_strides,
            dtype=dense_dt,
            name="pts_backbone",
        )(bev, train)
        neck_outs = SECONDFPN(
            out_channels=cfg.pts_neck.out_channels,
            upsample_strides=cfg.pts_neck.upsample_strides,
            dtype=dense_dt,
            name="pts_neck",
        )(sec, train)
        if dense_dt is not None:
            neck_outs = [f.astype(jnp.float32) for f in neck_outs]
        pts_feats = neck_outs[0]  # 512-ch concat map

        # ---- pillars for I2P ----
        pl = cfg.pts_pillar_layer
        max_pil = pl.max_voxels[0] if train else pl.max_voxels[1]

        po = voxelize_batched(
            batch["points"],
            batch["points_mask"],
            voxel_size=pl.voxel_size,
            point_cloud_range=pl.point_cloud_range,
            max_num_points=pl.max_num_points,
            max_voxels=max_pil,
        )
        mmri_batch = dict(batch)
        mmri_batch.update(
            pillars=po.voxels,
            pillar_counts=po.num_points,
            pillar_coords=po.coords,
            pillar_valid=jnp.arange(max_pil)[None, :] < po.num_voxels[:, None],
        )

        # ---- MMRI fusion ----
        if cfg.imgpts_neck.variant == "pp":
            # ++ consumes FPN levels 0-1 and all three BEV maps
            # (reference deepinteraction.py:148: multi_scale path)
            new_img, (pts_conv, new_pts) = FusionTransformerPP(
                cfg.imgpts_neck,
                vl.point_cloud_range,
                self.input_shape,
                name="imgpts_neck",
            )([unflat(f) for f in fpn_feats[:2]], neck_outs, mmri_batch, train)
        else:
            new_img, (pts_conv, new_pts) = MMRIEncoder(
                cfg.imgpts_neck,
                vl.point_cloud_range,
                self.input_shape,
                name="imgpts_neck",
            )(img_feats, pts_feats, mmri_batch, train)

        if encoder_only:
            return new_img, (pts_conv, new_pts)

        # ---- MMPI decoding ----
        preds = Decoder(
            cfg.pts_bbox_head,
            cfg.bbox_coder,
            self.input_shape,
            name="pts_bbox_head",
        )(
            (pts_conv, new_pts),
            new_img,
            mmri_batch,
            train,
            num_proposals=self.num_proposals,
        )
        return preds

    def _lidar_only(self, batch, train: bool):
        """Cameras-disabled detector (TransFusion-L lineage — the model the
        reference warm-starts from, config load_from L273): voxelize ->
        sparse encoder -> SECOND(+FPN) -> shared conv -> query decoder with
        num_mmpi = 0."""
        cfg = self.cfg
        vl = cfg.pts_voxel_layer
        max_vox = vl.max_voxels[0] if train else vl.max_voxels[1]

        vo = voxelize_batched(
            batch["points"],
            batch["points_mask"],
            voxel_size=vl.voxel_size,
            point_cloud_range=vl.point_cloud_range,
            max_num_points=vl.max_num_points,
            max_voxels=max_vox,
        )
        vfeats = jax.vmap(hard_simple_vfe)(vo.voxels, vo.num_points)
        vvalid = jnp.arange(max_vox)[None, :] < vo.num_voxels[:, None]
        bev = SparseEncoder(cfg.pts_middle_encoder, name="pts_middle_encoder")(
            vfeats, vo.coords, vvalid, train
        )
        sec = SECOND(
            out_channels=cfg.pts_backbone.out_channels,
            layer_nums=cfg.pts_backbone.layer_nums,
            layer_strides=cfg.pts_backbone.layer_strides,
            name="pts_backbone",
        )(bev, train)
        neck_outs = SECONDFPN(
            out_channels=cfg.pts_neck.out_channels,
            upsample_strides=cfg.pts_neck.upsample_strides,
            name="pts_neck",
        )(sec, train)
        pts_conv = nn.Conv(
            cfg.pts_bbox_head.hidden_channel, (3, 3), padding=1, name="shared_conv"
        )(neck_outs[0])
        return Decoder(
            cfg.pts_bbox_head,
            cfg.bbox_coder,
            self.input_shape,
            name="pts_bbox_head",
        )(
            (pts_conv, pts_conv),
            None,
            batch,
            train,
            num_proposals=self.num_proposals,
        )
