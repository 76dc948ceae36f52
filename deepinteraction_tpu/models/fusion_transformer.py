"""DeepInteraction++ MMRI encoder: FusionTransformer.

TPU-native rebuild of the reference ``FusionTransformerv4``
(models/necks/fusion_transformerv4.py): multi-scale (2-level) image and
LiDAR token sets, per-modality ``DeepInteractionLayer`` stacks with a
dual-branch output ``self_feat + scale * cross_feat`` (reference L142-218).

Redesigns (documented per class):
- mmcv ``MultiScaleDeformableAttention`` (CUDA) -> gather-based
  ops/deform_attn.py.
- flash-attn polar decoder -> plain XLA attention (R=60 rays x H=112 memory
  per column; XLA fuses fine at this size — SURVEY §5 long-context row).
- per-camera Python loop of MMRI_I2P_Polar (fusion_transformerv4.py:536+)
  -> vmap over cameras with visibility-count averaging.
- the reference's ``group_attn`` bucketing -> the v1 fixed-K masked
  attention (models/mmri_encoder.py MMRI_I2P); pp adds a residual
  (fusion_transformerv4.py:364).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..configs import MMRIEncoderConfig
from ..ops.deform_attn import MSDeformableAttention
from ..utils.geometry import grid_sample_2d, transform_points
from .layers import TorchLayerNorm, TorchMHA
from .mmri_encoder import BEVWarp, MMRI_I2P, bevwarp_grid


def sine_pos_2d(h: int, w: int, num_feats: int, temperature: float = 10000.0):
    """DETR sine positional encoding, [h, w, 2*num_feats] (y-half first),
    matching the reference TransSinePositionalEncoding
    (fusion_transformerv4.py:367-485)."""
    ys = np.arange(h, dtype=np.float32)
    xs = np.arange(w, dtype=np.float32)
    dim_t = temperature ** (2 * (np.arange(num_feats) // 2) / num_feats)

    def embed(v):
        p = v[:, None] / dim_t[None, :]
        out = np.empty_like(p)
        out[:, 0::2] = np.sin(p[:, 0::2])
        out[:, 1::2] = np.cos(p[:, 1::2])
        return out

    ye = np.broadcast_to(embed(ys)[:, None, :], (h, w, num_feats))
    xe = np.broadcast_to(embed(xs)[None, :, :], (h, w, num_feats))
    return jnp.asarray(np.concatenate([ye, xe], -1))


class TransFFN(nn.Module):
    """mmcv FFN with residual (2 fcs, relu, dropout)."""

    embed_dims: int
    feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Dense(self.feedforward, name="fc0")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.embed_dims, name="fc1")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + y


class MMRI_P2I_PP(nn.Module):
    """BEVWarp then single-level deformable attention
    (fusion_transformerv4.py:220-240)."""

    cfg: MMRIEncoderConfig
    pc_range: Tuple[float, ...]
    input_shape: Tuple[int, int]

    @nn.compact
    def __call__(self, img_map, pts_map, batch, train: bool = False, warp_grid=None):
        # img_map [B, V, h, w, C]; pts_map [B, Hb, Wb, C]
        b, v, h, w, c = img_map.shape
        warped = BEVWarp(self.pc_range, name="warp")(
            pts_map,
            img_map,
            batch["points"],
            batch["points_mask"],
            batch["lidar2img"],
            batch["img2lidar"],
            batch["lidar_aug"],
            batch["lidar_aug_inv"],
            self.input_shape,
            train,
            grid=warp_grid,
        )  # [B, V, h, w, C]
        q = img_map.reshape(b * v, h * w, c)
        val = warped.reshape(b * v, h * w, c)
        ys = (jnp.arange(h) + 0.5) / h
        xs = (jnp.arange(w) + 0.5) / w
        gx, gy = jnp.meshgrid(xs, ys)
        ref = jnp.broadcast_to(
            jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)[None, :, None, :],
            (b * v, h * w, 1, 2),
        )
        out = MSDeformableAttention(
            c, self.cfg.num_heads, 1, self.cfg.deform_num_points, name="local"
        )(q, val, ref, [(h, w)], train=train)
        return out.reshape(b, v, h, w, c)


class PolarI2P(nn.Module):
    """Polar-ray image-to-points interaction (fusion_transformerv4.py:487-640).

    Per camera: one polar query per (image column, radius bin) sampled from
    the LiDAR BEV map + sine positions; a 1-layer transformer decoder attends
    rays to the column's image pixels; ray outputs are splatted back onto the
    BEV grid at (column, radius) with per-camera visibility averaging, then a
    residual adds the input map. Cameras are vmapped (shared weights).
    """

    cfg: MMRIEncoderConfig
    pc_range: Tuple[float, ...]
    input_shape: Tuple[int, int]
    radius_range: Tuple[float, float, float] = (1.0, 61.0, 1.0)
    num_z_bins: int = 10
    im_scale: float = 4.0

    @nn.compact
    def __call__(self, pts_map, img_map, batch, train: bool = False):
        # pts_map [B, Hb, Wb, C]; img_map [B, V, h, w, C]
        cfg = self.cfg
        b, v, h, w, c = img_map.shape
        hb, wb = pts_map.shape[1], pts_map.shape[2]
        r0, r1, rstep = self.radius_range
        r = int((r1 - r0) / rstep)
        ih, iw = self.input_shape
        pcr = jnp.asarray(self.pc_range)

        img_pos = sine_pos_2d(h, w, c // 2)  # [h, w, C]
        ray_pos = sine_pos_2d(r, w, c // 2)  # [r, w, C]
        depths = r0 + rstep * (jnp.arange(r) + 0.5)  # bin centers

        mha = lambda name: TorchMHA(c, cfg.num_heads, cfg.dropout, name=name)
        self_attn = mha("dec_self_attn")
        cross_attn = mha("dec_cross_attn")
        ffn = TransFFN(c, 4 * c, cfg.dropout, name="dec_ffn")
        norm1 = TorchLayerNorm(name="dec_norm1")
        norm2 = TorchLayerNorm(name="dec_norm2")
        norm3 = TorchLayerNorm(name="dec_norm3")
        dec_norm = TorchLayerNorm(name="dec_out_norm")
        mem_norm = TorchLayerNorm(name="enc_out_norm")

        def rays_one_view(l2i, i2l, c2l_t):
            """Ray directions in raw-lidar XY for each feature column."""
            u = (jnp.arange(w, dtype=jnp.float32) + 0.5) * self.im_scale
            vpix = jnp.full((w,), (h // 2) * self.im_scale, jnp.float32)
            pix = jnp.stack([u, vpix, jnp.ones_like(u), jnp.ones_like(u)], -1)
            pt = pix @ i2l.T  # depth-1 point in lidar frame
            d = pt[:, :2] - c2l_t[None, :2]
            return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)

        def per_sample(pmap, imap, l2i, i2l, c2l, aug, aug_inv):
            def per_view(ifeat, l2i_v, i2l_v, c2l_v):
                ray_dir = rays_one_view(l2i_v, i2l_v, c2l_v[:3, 3])  # [w, 2]
                centers = depths[:, None, None] * ray_dir[None]  # [r, w, 2]
                centers3 = jnp.concatenate(
                    [centers, jnp.zeros_like(centers[..., :1])], -1
                )
                centers_aug = transform_points(aug, centers3)
                gxy = (centers_aug[..., :2] - pcr[:2]) / (pcr[3:5] - pcr[:2])
                polar_q = grid_sample_2d(pmap, gxy * 2.0 - 1.0)  # [r, w, C]
                polar_q = polar_q + ray_pos

                cols = ifeat + img_pos  # [h, w, C]
                mem = mem_norm(jnp.transpose(cols, (1, 0, 2)))  # [w, h, C]
                tgt = jnp.transpose(polar_q, (1, 0, 2))  # [w, r, C]
                # post-norm torch TransformerDecoderLayer
                y = self_attn(tgt, tgt, tgt, train=train)
                tgt = norm1(tgt + y)
                y = cross_attn(tgt, mem, mem, train=train)
                tgt = norm2(tgt + y)
                tgt = norm3(ffn(tgt, train))
                bev_out = jnp.transpose(dec_norm(tgt), (1, 0, 2))  # [r, w, C]

                # splat back: project BEV (+z bins) into this camera
                xs_b = (jnp.arange(wb) + 0.5) / wb * (pcr[3] - pcr[0]) + pcr[0]
                ys_b = (jnp.arange(hb) + 0.5) / hb * (pcr[4] - pcr[1]) + pcr[1]
                zs_b = (jnp.arange(self.num_z_bins) + 0.5) / self.num_z_bins * (
                    pcr[5] - pcr[2]
                ) + pcr[2]
                gx, gy, gz = jnp.meshgrid(xs_b, ys_b, zs_b, indexing="xy")
                # [hb, wb, z, 3] grid in model (augmented) frame -> raw frame
                pts3 = jnp.stack([gx, gy, gz], -1)
                raw = transform_points(aug_inv, pts3)
                hom = jnp.concatenate([raw, jnp.ones_like(raw[..., :1])], -1)
                cam = hom @ l2i_v.T
                eps = 1e-5
                ok = cam[..., 2] > eps
                xy = cam[..., :2] / jnp.maximum(cam[..., 2:3], eps)
                gxn = xy[..., 0] / iw * 2.0 - 1.0
                gyn = xy[..., 1] / ih * 2.0 - 1.0
                ok = ok & (gxn > -1) & (gxn < 1) & (gyn > -1) & (gyn < 1)
                radius = jnp.linalg.norm(raw[..., :2] - c2l_v[:2, 3], axis=-1)
                # normalize by the metric span r1-r0 (== r * rstep), not the
                # bin count r — they only coincide when rstep == 1
                rn = jnp.clip(2.0 * (radius - r0) / (r1 - r0) - 1.0, -1.0, 1.0)
                # plain mean over ALL z bins, including out-of-view ones —
                # reference parity (fusion_transformerv4.py:627 `.mean(dim=3)`
                # with no mask); visibility only gates the final splat
                loc = jnp.mean(jnp.stack([gxn, rn], -1), axis=2)  # [hb, wb, 2]
                vis = jnp.sum(ok, axis=2) > 0  # [hb, wb]
                sampled = grid_sample_2d(bev_out, loc)  # [hb, wb, C]
                return jnp.where(vis[..., None], sampled, 0.0), vis

            outs, vis = jax.vmap(per_view)(imap, l2i, i2l, c2l)
            cnt = jnp.maximum(jnp.sum(vis, 0), 1)[..., None]
            return jnp.sum(outs, 0) / cnt

        dec = jax.vmap(per_sample)(
            pts_map,
            img_map,
            batch["lidar2img"],
            batch["img2lidar"],
            batch["cam2lidar"],
            batch["lidar_aug"],
            batch["lidar_aug_inv"],
        )
        return dec + pts_map


class FusionLayerImg(nn.Module):
    """Image-branch DeepInteractionLayer: MSDA self-attn over 2 image levels,
    MMRI_P2I cross-attn, dual-branch combine (fusion_transformerv4.py:159-217,
    operation_order config Fusion_0075_plusplus.py:239-240)."""

    cfg: MMRIEncoderConfig
    pc_range: Tuple[float, ...]
    input_shape: Tuple[int, int]

    @nn.compact
    def __call__(
        self, img_map, pts_map, ms_tokens, ref, shapes, batch, train, warp_grid=None
    ):
        cfg = self.cfg
        c = cfg.hidden_channel
        b, v, h, w, _ = img_map.shape
        q = img_map.reshape(b * v, h * w, c)
        q = MSDeformableAttention(
            c, cfg.num_heads, cfg.num_levels, cfg.deform_num_points, name="self_attn"
        )(q, ms_tokens, ref, shapes, train=train)
        self_feat = q
        q = TorchLayerNorm(name="norm0")(q)
        q = MMRI_P2I_PP(cfg, self.pc_range, self.input_shape, name="p2i")(
            q.reshape(b, v, h, w, c), pts_map, batch, train, warp_grid=warp_grid
        ).reshape(b * v, h * w, c)
        q = TorchLayerNorm(name="norm1")(q)
        q = TransFFN(c, 4 * c, cfg.dropout, name="ffn0")(q, train)
        q = TorchLayerNorm(name="norm2")(q)
        self_feat = TransFFN(c, 4 * c, cfg.dropout, name="ffn1")(self_feat, train)
        self_feat = TorchLayerNorm(name="norm3")(self_feat)
        scale = self.param("scale", nn.initializers.ones, (1,))
        out = self_feat + scale * q
        return out.reshape(b, v, h, w, c)


class FusionLayerPts(nn.Module):
    """LiDAR-branch DeepInteractionLayer: MSDA self-attn over 2 BEV levels,
    polar I2P + pillar I2P cross-attns (operation_order config L269-270)."""

    cfg: MMRIEncoderConfig
    pc_range: Tuple[float, ...]
    input_shape: Tuple[int, int]

    @nn.compact
    def __call__(self, pts_map, img_map, ms_tokens, ref, shapes, batch, train):
        cfg = self.cfg
        c = cfg.hidden_channel
        b, hb, wb, _ = pts_map.shape
        q = pts_map.reshape(b, hb * wb, c)
        q = MSDeformableAttention(
            c, cfg.num_heads, cfg.num_levels, cfg.deform_num_points, name="self_attn"
        )(q, ms_tokens, ref, shapes, train=train)
        self_feat = q
        q = TorchLayerNorm(name="norm0")(q)
        qm = q.reshape(b, hb, wb, c)
        if cfg.use_polar_i2p:
            qm = PolarI2P(
                cfg,
                self.pc_range,
                self.input_shape,
                radius_range=cfg.polar_radius_range,
                num_z_bins=cfg.polar_num_z_bins,
                name="polar_i2p",
            )(qm, img_map, batch, train)
            qm = TorchLayerNorm(name="norm1")(qm.reshape(b, hb * wb, c)).reshape(
                b, hb, wb, c
            )
        i2p = MMRI_I2P(c, cfg.i2p_max_keys, name="i2p")(
            qm,
            img_map,
            batch["pillars"],
            batch["pillar_counts"],
            batch["pillar_coords"],
            batch["pillar_valid"],
            batch["lidar2img"],
            batch["lidar_aug_inv"],
            self.input_shape,
            train,
        )
        qm = qm + i2p  # pp I2P residual (fusion_transformerv4.py:364)
        q = TorchLayerNorm(name="norm2")(qm.reshape(b, hb * wb, c))
        self_feat = TransFFN(c, 4 * c, cfg.dropout, name="ffn0")(self_feat, train)
        self_feat = TorchLayerNorm(name="norm3")(self_feat)
        scale = self.param("scale", nn.initializers.ones, (1,))
        out = self_feat + scale * q
        return out.reshape(b, hb, wb, c)


class FusionTransformerPP(nn.Module):
    """Reference FusionTransformerv4.forward (L84-127): shared conv on the
    512-ch concat LiDAR map, per-level 3x3 convs to hidden width, then
    ``num_layers`` alternating image/LiDAR interaction layers over the
    level-0 maps with multi-scale token sets as MSDA values."""

    cfg: MMRIEncoderConfig
    pc_range: Tuple[float, ...]
    input_shape: Tuple[int, int]

    @nn.compact
    def __call__(
        self,
        ms_img_feats: Sequence[jnp.ndarray],  # 2x [B, V, h_l, w_l, Cin]
        pts_feats: Sequence[jnp.ndarray],  # [concat512, up0, up1] BEV maps
        batch: Dict[str, Any],
        train: bool = False,
    ):
        cfg = self.cfg
        c = cfg.hidden_channel
        b, v = ms_img_feats[0].shape[0], ms_img_feats[0].shape[1]

        pts_feat_conv = nn.Conv(c, (3, 3), padding=1, name="shared_conv_pts")(
            pts_feats[0]
        )
        conv_img = nn.Conv(c, (3, 3), padding=1, name="multi_scale_conv_img")
        conv_pts = nn.Conv(c, (3, 3), padding=1, name="multi_scale_conv_pts")
        flat = lambda x: x.reshape((b * v,) + x.shape[2:])
        ms_img = [
            conv_img(flat(f)).reshape((b, v) + f.shape[2:4] + (c,))
            for f in ms_img_feats
        ]
        ms_pts = [conv_pts(f) for f in pts_feats[1:]]

        img_shapes = [(f.shape[2], f.shape[3]) for f in ms_img]
        img_tokens = jnp.concatenate(
            [f.reshape(b * v, -1, c) for f in ms_img], axis=1
        )
        pts_shapes = [(f.shape[1], f.shape[2]) for f in ms_pts]
        pts_tokens = jnp.concatenate([f.reshape(b, -1, c) for f in ms_pts], axis=1)

        def ref_points(hq, wq, n, levels):
            ys = (jnp.arange(hq) + 0.5) / hq
            xs = (jnp.arange(wq) + 0.5) / wq
            gx, gy = jnp.meshgrid(xs, ys)
            ref = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)
            return jnp.broadcast_to(
                ref[None, :, None, :], (n, hq * wq, levels, 2)
            )

        h0, w0 = img_shapes[0]
        ref_img = ref_points(h0, w0, b * v, cfg.num_levels)
        hb, wb = pts_shapes[0]
        ref_pts = ref_points(hb, wb, b, cfg.num_levels)

        # BEVWarp geometry depends only on points/calibration — compute
        # once at level-0 resolution and reuse in every image layer
        warp_grid = bevwarp_grid(
            batch["points"],
            batch["points_mask"],
            batch["lidar2img"],
            batch["img2lidar"],
            batch["lidar_aug"],
            batch["lidar_aug_inv"],
            img_shapes[0],
            self.input_shape,
            self.pc_range,
            train=train,
        )

        # Under train, remat each interaction layer: the fwd+bwd residuals
        # of the dual-branch layers (MSDA sampling intermediates at
        # [6, 22400, 128] x many) exceed 16 GB HBM at full size even with
        # the frozen trunks' backward DCE'd (PERF.md round 4) — layer-
        # boundary checkpointing trades one forward recompute per layer
        # for fitting the full-size ++ train step on one chip.
        ImgLayer, PtsLayer = FusionLayerImg, FusionLayerPts
        if train:
            ImgLayer = nn.remat(FusionLayerImg, static_argnums=(5, 7))
            PtsLayer = nn.remat(FusionLayerPts, static_argnums=(5, 7))
        img_shapes = tuple(img_shapes)
        pts_shapes = tuple(pts_shapes)

        new_img, new_pts = ms_img[0], ms_pts[0]
        for i in range(cfg.num_layers):
            tmp_img = ImgLayer(
                cfg, self.pc_range, self.input_shape, name=f"img_layer{i}"
            )(
                new_img, new_pts, img_tokens, ref_img, img_shapes, batch, train,
                warp_grid,
            )
            tmp_pts = PtsLayer(
                cfg, self.pc_range, self.input_shape, name=f"pts_layer{i}"
            )(new_pts, new_img, pts_tokens, ref_pts, pts_shapes, batch, train)
            new_img, new_pts = tmp_img, tmp_pts
        return new_img, (pts_feat_conv, new_pts)
