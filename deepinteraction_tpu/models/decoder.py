"""MMPI decoder head: heatmap-initialized query decoder with alternating
image / LiDAR predictive-interaction refinement.

TPU-native rebuild of the reference ``DeepInteractionDecoder``
(models/dense_heads/deepinteraction_decoder.py) + its blocks
(models/utils/decoder_utils.py). Redesigns:

- the per-sample/per-view Python loops of ImageRCNNBlock/PointRCNNBlock
  (decoder_utils.py:681,695,805) become a vmap over views with key masks;
  the reference's "last view wins" overwrite (decoder_utils.py:759) becomes
  a select of the highest active view index per query — bit-equivalent,
  since per-view computation only mixes queries of the same view.
- heatmap top-k init via lax.top_k; "skip view if <=1 queries" becomes a
  static mask (view_active).
- everything is channels-last [B, P, C]; static P proposals.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import BBoxCoderConfig, DecoderConfig
from ..ops.roi_align import roi_align, roi_align_views
from ..targets.coder import TransFusionBBoxCoder
from ..utils.boxes import corners as box_corners
from ..utils.geometry import transform_points
from .layers import ConvBNReLU, MLP1d, TorchLayerNorm, TorchMHA


class PositionEmbeddingLearned(nn.Module):
    """Conv1d(2->C) + BN1d + ReLU + Conv1d(C->C) (decoder_utils.py:16-32)."""

    feats: int

    @nn.compact
    def __call__(self, xy, train: bool = False):
        x = nn.Dense(self.feats, name="fc0")(xy)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn0")(x)
        x = nn.relu(x)
        return nn.Dense(self.feats, name="fc1")(x)


class TransformerDecoderLayer(nn.Module):
    """Self-attn + cross-attn + FFN with learned pos embeds
    (decoder_utils.py:35-113)."""

    d_model: int
    nhead: int
    dim_ff: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos, train: bool = False):
        qe = PositionEmbeddingLearned(self.d_model, name="self_posembed")(query_pos, train)
        ke = PositionEmbeddingLearned(self.d_model, name="cross_posembed")(key_pos, train)
        q = query + qe
        y = TorchMHA(self.d_model, self.nhead, self.dropout, name="self_attn")(
            q, q, q, train=train
        )
        query = TorchLayerNorm(name="norm1")(query + y)
        y = TorchMHA(self.d_model, self.nhead, self.dropout, name="cross_attn")(
            query + qe, key + ke, key + ke, train=train
        )
        query = TorchLayerNorm(name="norm2")(query + y)
        y = nn.Dense(self.dim_ff, name="linear1")(query)
        y = nn.Dense(self.d_model, name="linear2")(nn.relu(y))
        return TorchLayerNorm(name="norm3")(query + y)


class PredictionFFN(nn.Module):
    """Per-proposal multi-branch prediction head (decoder_utils.py:498-581)."""

    heads: Tuple[Tuple[str, Tuple[int, int]], ...]
    head_conv: int = 64
    init_bias: float = -2.19

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        out = {}
        for name, (classes, num_conv) in self.heads:
            out[name] = MLP1d(
                self.head_conv,
                classes,
                num_layers=num_conv,
                final_bias_init=self.init_bias if name == "heatmap" else None,
                name=name,
            )(x, train)
        return out


class DynamicConv(nn.Module):
    """Query-conditioned two-step dynamic matmul over 7x7 ROI features
    (Sparse-RCNN style; decoder_utils.py:584-629)."""

    hidden: int = 128
    dyn: int = 128
    pool: int = 7

    @nn.compact
    def __call__(self, pro_features, roi_features):
        """pro_features [*, P, C]; roi_features [*, P, 49, C] -> [*, P, C]."""
        n = self.hidden * self.dyn
        params = nn.Dense(2 * n, name="dynamic_layer")(pro_features)
        p1 = params[..., :n].reshape(params.shape[:-1] + (self.hidden, self.dyn))
        p2 = params[..., n:].reshape(params.shape[:-1] + (self.dyn, self.hidden))
        f = jnp.einsum("...kc,...cd->...kd", roi_features, p1)
        f = nn.relu(TorchLayerNorm(name="norm1")(f))
        f = jnp.einsum("...kd,...dc->...kc", f, p2)
        f = nn.relu(TorchLayerNorm(name="norm2")(f))
        f = f.reshape(f.shape[:-2] + (self.pool * self.pool * self.hidden,))
        f = nn.Dense(self.hidden, name="out_layer")(f)
        return nn.relu(TorchLayerNorm(name="norm3")(f))


def _mask_kw(mask):
    """Route a [B, S] key mask or [B, L, S] per-query mask to TorchMHA."""
    if mask is None:
        return {}
    return {"attn_mask": mask} if mask.ndim == 3 else {"key_mask": mask}


class _RCNNCore(nn.Module):
    """Shared self-attn -> DynamicConv -> FFN trunk of the RCNN blocks
    (decoder_utils.py:743-756 and 824-837)."""

    hidden: int
    num_heads: int
    dropout: float
    train_mode: bool = False

    @nn.compact
    def __call__(self, query_feat, roi_feats, attn_key_mask):
        train = self.train_mode
        y = TorchMHA(self.hidden, self.num_heads, self.dropout, name="self_attn")(
            query_feat, query_feat, query_feat, **_mask_kw(attn_key_mask), train=train
        )
        q = TorchLayerNorm(name="norm1")(query_feat + y)
        y = DynamicConv(self.hidden, self.hidden, name="dyconv")(q, roi_feats)
        q = TorchLayerNorm(name="norm2")(q + y)
        y = nn.Dense(self.hidden * 4, name="linear1")(q)
        # exact erf GELU (torch F.gelu default; decoder_utils.py:60)
        y = nn.Dense(self.hidden, name="linear2")(nn.gelu(y, approximate=False))
        return TorchLayerNorm(name="norm3")(q + y)


class _RCNNCoreV2(nn.Module):
    """++ dual-branch trunk (ImageRCNNBlockV2/PointRCNNBlockV2,
    decoder_utils.py:844-1090): self-attn -> norm (branch point), DynamicConv
    + FFN on the cross branch, a separate FFN on the self branch, combined
    with two learned scalar scales initialized at 0.5.

    NB the reference's combine BROADCASTS: the self branch is still in the
    torch seq-first [N, 1, C] layout when added to the batch-first [1, N, C]
    cross branch, and ``[0]`` of the resulting [N, N, C] is kept
    (decoder_utils.py:986-990 and 1085-1088) — so EVERY query receives the
    self-branch value of the FIRST query of its attention group (query 0 for
    the point block; the first on-image query of the view for the image
    block). Replicated exactly: released ++ checkpoints were trained with
    this. ``self_contrib`` lets the image block supply the per-view value."""

    hidden: int
    num_heads: int
    dropout: float
    train_mode: bool = False

    def setup(self):
        c = self.hidden
        self.self_attn = TorchMHA(c, self.num_heads, self.dropout)
        self.norm1 = TorchLayerNorm()
        self.dyconv = DynamicConv(c, c)
        self.norm2 = TorchLayerNorm()
        self.norm3 = TorchLayerNorm()
        self.ffn_fc0 = nn.Dense(c * 4)
        self.ffn_fc1 = nn.Dense(c)
        self.self_ffn_fc0 = nn.Dense(c * 4)
        self.self_ffn_fc1 = nn.Dense(c)
        self.self_norm = TorchLayerNorm()
        self.scale = self.param("scale", nn.initializers.constant(0.5), (1,))
        self.self_scale = self.param("self_scale", nn.initializers.constant(0.5), (1,))

    def norm1_block(self, query_feat, attn_key_mask):
        """self-attn + residual + norm1 (the branch point)."""
        y = self.self_attn(
            query_feat,
            query_feat,
            query_feat,
            **_mask_kw(attn_key_mask),
            train=self.train_mode,
        )
        return self.norm1(query_feat + y)

    def self_branch(self, q1):
        """identity-add FFN + norm on the self branch (mmcv FFN semantics)."""
        y = self.self_ffn_fc0(q1)
        return self.self_norm(q1 + self.self_ffn_fc1(nn.relu(y)))

    def __call__(self, query_feat, roi_feats, attn_key_mask, self_contrib=None):
        q = self.norm1_block(query_feat, attn_key_mask)
        if self_contrib is None:
            # point block: all queries get query 0's self-branch value
            self_contrib = self.self_branch(q)[..., :1, :]
        y = self.dyconv(q, roi_feats)
        q = self.norm2(q + y)
        y = self.ffn_fc0(q)
        q = self.norm3(q + self.ffn_fc1(nn.relu(y)))
        return q * self.scale + self_contrib * self.self_scale


def _rcnn_core(variant: str):
    return _RCNNCoreV2 if variant == "pp" else _RCNNCore


class ImageRCNNBlock(nn.Module):
    """Project query boxes into each view, ROI-crop image features, refine
    on-image queries (decoder_utils.py:632-761). vmapped over views."""

    cfg: DecoderConfig
    coder: TransFusionBBoxCoder
    input_shape: Tuple[int, int]  # padded camera image (H, W), static

    @nn.compact
    def __call__(self, query_feat, res_layer, img_feats, batch, train: bool = False):
        cfg = self.cfg
        b, p, c = query_feat.shape
        v = img_feats.shape[1]
        ih, iw = self.input_shape

        dec = self.coder.decode(jax.tree_util.tree_map(jax.lax.stop_gradient, res_layer))
        boxes = dec.boxes  # [B, P, 9]
        # query 3D position: real-metric center + gravity z (reference uses
        # res['height'] directly, decoder L667)
        ccfg = self.coder.cfg
        qx = res_layer["center"][..., 0] * ccfg.out_size_factor * ccfg.voxel_size[0] + ccfg.pc_range[0]
        qy = res_layer["center"][..., 1] * ccfg.out_size_factor * ccfg.voxel_size[1] + ccfg.pc_range[1]
        qz = res_layer["height"][..., 0]
        centers3d = jax.lax.stop_gradient(jnp.stack([qx, qy, qz], -1))  # [B,P,3]
        crn = box_corners(boxes[..., :7])  # [B, P, 8, 3]

        def project(ctr, crn_s, l2i, aug_inv):
            """One sample: projection math only (on-image masks + corner
            rects per view); sampling happens once, for the winning view."""
            pts = jnp.concatenate([ctr, crn_s.reshape(p * 8, 3)], 0)  # [9P, 3]
            raw = transform_points(aug_inv, pts)
            hom = jnp.concatenate([raw, jnp.ones_like(raw[:, :1])], -1)

            def per_view(mat):
                cam = hom @ mat.T
                z = jnp.maximum(cam[:, 2], 1e-5)
                xy = cam[:, :2] / z[:, None]
                cxy, korn = xy[:p], xy[p:].reshape(p, 8, 2)
                on_img = (
                    (cxy[:, 0] > 0) & (cxy[:, 0] < iw) & (cxy[:, 1] > 0) & (cxy[:, 1] < ih)
                )
                view_active = jnp.sum(on_img) > 1  # reference skip rule L726
                on_img = on_img & view_active
                rect = jnp.concatenate(
                    [jnp.min(korn, axis=1), jnp.max(korn, axis=1)], -1
                )  # [P, 4] (x0, y0, x1, y1) image coords
                return rect, on_img

            return jax.vmap(per_view)(l2i)

        rect, on_img = jax.vmap(project)(
            centers3d, crn, batch["lidar2img"], batch["lidar_aug_inv"]
        )  # rect [B, V, P, 4]; on_img [B, V, P]

        # "last view wins" (reference runs the RCNN for every view and lets
        # the last on-image view's rows overwrite, decoder_utils.py:726-758)
        # — only ONE view's refinement survives per query, so resolve the
        # winner FIRST and sample/refine only that view: 6x less ROI
        # sampling and attention for identical output.
        view_ids = jnp.arange(v)[None, :, None]
        eff = jnp.max(jnp.where(on_img, view_ids, -1), axis=1)  # [B, P]
        any_on = eff >= 0
        sel = jnp.clip(eff, 0, v - 1)

        rect_sel = jnp.take_along_axis(rect, sel[:, None, :, None], axis=1)[:, 0]
        rois = jax.vmap(
            lambda f, r, vi: roi_align_views(
                f, r, vi, output_size=7,
                spatial_scale=1.0 / cfg.out_size_factor_img,
            )
        )(img_feats, rect_sel, sel)  # [B, P, 7, 7, C]
        rois = rois.reshape(b, p, 49, c)

        # per-query key set: query i self-attends over the queries on ITS
        # winning view (what the per-view key mask expressed before);
        # diagonal forced on so fully-off queries stay NaN-free
        attn_mask = jnp.take_along_axis(on_img, sel[:, :, None], axis=1)
        attn_mask = attn_mask | jnp.eye(p, dtype=bool)[None]

        core = _rcnn_core(cfg.variant)(
            cfg.hidden_channel, cfg.num_heads, cfg.dropout, train, name="core"
        )
        if cfg.variant == "pp":
            # reference broadcast quirk (see _RCNNCoreV2 docstring): each
            # view's self-term is the self-branch of that view's FIRST
            # on-image query, computed with the view's own key set
            # (decoder_utils.py:970-990); every query of the view gets it.
            qf_v = jnp.broadcast_to(
                query_feat[:, None], (b, v, p, c)
            ).reshape(b * v, p, c)
            q1 = core.norm1_block(qf_v, on_img.reshape(b * v, p))
            jstar = jnp.argmax(on_img, axis=2).reshape(b * v)
            q1_star = jnp.take_along_axis(q1, jstar[:, None, None], axis=1)
            s_view = core.self_branch(q1_star).reshape(b, v, c)
            self_contrib = jnp.take_along_axis(s_view, sel[..., None], axis=1)
            refined = core(query_feat, rois, attn_mask, self_contrib)
        else:
            refined = core(query_feat, rois, attn_mask)  # [B, P, C]

        out = jnp.where(any_on[..., None], refined, 0.0)
        return out, eff  # eff == -1 means "not on any image"


class PointRCNNBlock(nn.Module):
    """ROI refinement against the fused BEV map, 2x-enlarged boxes
    (decoder_utils.py:765-841)."""

    cfg: DecoderConfig
    coder: TransFusionBBoxCoder

    @nn.compact
    def __call__(self, query_feat, res_layer, bev_feat, train: bool = False):
        cfg = self.cfg
        b, p, c = query_feat.shape
        dec = self.coder.decode(jax.tree_util.tree_map(jax.lax.stop_gradient, res_layer))
        boxes = dec.boxes[..., :7]
        boxes = boxes.at[..., 3:6].multiply(2.0)
        crn = box_corners(boxes)[..., :2]  # [B, P, 8, 2]
        ccfg = self.coder.cfg
        scale = ccfg.voxel_size[0] * ccfg.out_size_factor
        coor = (crn - jnp.asarray(ccfg.pc_range[:2])) / scale
        rect = jnp.concatenate([jnp.min(coor, axis=2), jnp.max(coor, axis=2)], -1)

        rois = jax.vmap(
            lambda f, r: roi_align(f, r, output_size=7, spatial_scale=1.0)
        )(bev_feat, rect)  # [B, P, 7, 7, C]
        rois = rois.reshape(b, p, 49, c)
        core = _rcnn_core(cfg.variant)
        return (
            core(cfg.hidden_channel, cfg.num_heads, cfg.dropout, train, name="core")(
                query_feat, rois, None
            ),
            None,
        )


class Decoder(nn.Module):
    """Full MMPI head (reference deepinteraction_decoder.py:201-313)."""

    cfg: DecoderConfig
    coder_cfg: BBoxCoderConfig
    input_shape: Tuple[int, int]  # padded camera image (H, W)

    @nn.compact
    def __call__(
        self,
        pts_inputs: Tuple[jnp.ndarray, jnp.ndarray],  # (lidar_feat, new_lidar_feat) [B,H,W,C]
        img_feats: jnp.ndarray,  # [B, V, h, w, C]
        batch: Dict[str, Any],
        train: bool = False,
        num_proposals: int | None = None,
    ):
        cfg = self.cfg
        coder = TransFusionBBoxCoder(self.coder_cfg)
        p = num_proposals or cfg.num_proposals
        lidar_feat, new_lidar_feat = pts_inputs
        b, hb, wb, c = lidar_feat.shape
        n_cls = cfg.num_classes

        # dense heatmaps (lidar-only: single head, TransFusion-L style)
        def heat_head(name, x):
            y = ConvBNReLU(c, 3, name=f"{name}_0")(x, train)
            return nn.Conv(n_cls, (3, 3), padding=1, name=f"{name}_1")(y)

        dense_heatmap = heat_head("heatmap_head", lidar_feat)
        if cfg.lidar_only:
            dense_heatmap_img = dense_heatmap
            heatmap = jax.lax.stop_gradient(jax.nn.sigmoid(dense_heatmap))
        else:
            dense_heatmap_img = heat_head("heatmap_head_img", new_lidar_feat)
            heatmap = jax.lax.stop_gradient(
                (jax.nn.sigmoid(dense_heatmap) + jax.nn.sigmoid(dense_heatmap_img)) / 2.0
            )  # [B, H, W, cls]

        # local-max NMS (k=3 interior; identity for ped/cone classes 8, 9)
        hm = jnp.transpose(heatmap, (0, 3, 1, 2))  # [B, cls, H, W]
        pad = cfg.nms_kernel_size // 2
        win = cfg.nms_kernel_size
        inner = jax.lax.reduce_window(
            hm, -jnp.inf, jax.lax.max, (1, 1, win, win), (1, 1, 1, 1), "VALID"
        )
        local_max = jnp.zeros_like(hm)
        local_max = local_max.at[:, :, pad:-pad, pad:-pad].set(inner)
        if n_cls == 10:  # nuScenes: pedestrian(8) & traffic_cone(9) keep k=1
            local_max = local_max.at[:, 8].set(hm[:, 8])
            local_max = local_max.at[:, 9].set(hm[:, 9])
        hm = hm * (hm == local_max)
        hm_flat = hm.reshape(b, n_cls * hb * wb)

        if b > 1:
            # XLA's TopK custom-call has no SPMD partitioning rule: on a
            # data-sharded mesh the partitioner all-gathers the heatmap to
            # every device (the only collective in the whole eval graph —
            # tests/test_dp_serving.py). A stable sort of (-x, iota) is
            # fully batch-partitionable and reproduces top_k exactly,
            # including smallest-index tie-breaking.
            iota = jax.lax.broadcasted_iota(jnp.int32, hm_flat.shape, 1)
            neg, idx = jax.lax.sort((-hm_flat, iota), num_keys=1, is_stable=True)
            top_scores, top_idx = -neg[:, :p], idx[:, :p]
        else:
            top_scores, top_idx = jax.lax.top_k(hm_flat, p)
        top_cls = (top_idx // (hb * wb)).astype(jnp.int32)  # [B, P]
        top_pos = (top_idx % (hb * wb)).astype(jnp.int32)

        lidar_flat = lidar_feat.reshape(b, hb * wb, c)
        query_feat = jnp.take_along_axis(lidar_flat, top_pos[..., None], axis=1)
        one_hot = jax.nn.one_hot(top_cls, n_cls)
        query_feat = query_feat + nn.Dense(c, name="class_encoding")(one_hot)

        # bev positions (x = col + .5, y = row + .5)
        ys = (top_pos // wb).astype(jnp.float32) + 0.5
        xs = (top_pos % wb).astype(jnp.float32) + 0.5
        query_pos = jnp.stack([xs, ys], -1)  # [B, P, 2]
        rows = jnp.arange(hb, dtype=jnp.float32) + 0.5
        cols = jnp.arange(wb, dtype=jnp.float32) + 0.5
        gx, gy = jnp.meshgrid(cols, rows)
        bev_pos = jnp.broadcast_to(
            jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)[None], (b, hb * wb, 2)
        )

        # transformer decoder vs LiDAR BEV tokens
        query_feat = TransformerDecoderLayer(
            c, cfg.num_heads, cfg.ffn_channel, cfg.dropout, name="decoder0"
        )(query_feat, lidar_flat, query_pos, bev_pos, train)
        res_layer = PredictionFFN(cfg.common_heads + (("heatmap", (n_cls, cfg.num_heatmap_convs)),), name="pred0")(
            query_feat, train
        )
        res_layer["center"] = res_layer["center"] + query_pos
        first_res_layer = res_layer

        ret_dicts: List[Dict[str, jnp.ndarray]] = []
        on_image_masks: List[jnp.ndarray] = []
        heads_spec = cfg.common_heads + (("heatmap", (n_cls, cfg.num_heatmap_convs)),)
        pp = cfg.variant == "pp"
        # ++ look-forward center update (deepinteractionplusplus_decoder.py:281-294)
        query_pos_look_forward = jax.lax.stop_gradient(res_layer["center"])
        for layer_idx in range(cfg.num_mmpi):
            prev_query_feat = query_feat
            query_pos = jax.lax.stop_gradient(res_layer["center"])
            if layer_idx % 2 == 0:
                query_feat, eff_view = ImageRCNNBlock(
                    cfg, coder, self.input_shape, name=f"mmpi{layer_idx}_img"
                )(prev_query_feat, res_layer, img_feats, batch, train)
            else:
                query_feat, eff_view = PointRCNNBlock(
                    cfg, coder, name=f"mmpi{layer_idx}_pts"
                )(prev_query_feat, res_layer, new_lidar_feat, train)
            # v1 pred heads take concat(cross, prev); ++ takes cross only
            # (deepinteraction_decoder.py:288 vs plusplus L291)
            pred_in = (
                query_feat if pp else jnp.concatenate([query_feat, prev_query_feat], -1)
            )
            res_layer = PredictionFFN(heads_spec, name=f"mmpi{layer_idx}_pred")(
                pred_in, train
            )
            if pp:
                pred_delta = res_layer["center"]
                res_layer["center"] = pred_delta + query_pos_look_forward
                # NB: pred_delta keeps its gradient here (reference clones,
                # not detaches — plusplus L292); the next layer's center
                # backpropagates into this layer's delta
                query_pos_look_forward = pred_delta + query_pos
            else:
                res_layer["center"] = res_layer["center"] + query_pos
            if pp:
                # cumulative on-image mask ANDing; odd layers inherit
                # (plusplus L295-302); fallback applies at every layer
                if layer_idx % 2 == 0:
                    on_img = eff_view >= 0
                    if on_image_masks:
                        on_img = on_img & on_image_masks[-1]
                else:
                    on_img = on_image_masks[-1]
                on_image_masks.append(on_img)
                res_layer = {
                    k: jnp.where(on_img[..., None], v, first_res_layer[k])
                    for k, v in res_layer.items()
                }
            elif layer_idx % 2 == 0:
                on_img = eff_view >= 0  # [B, P]
                on_image_masks.append(on_img)
                # off-image queries fall back to the initial predictions
                res_layer = {
                    k: jnp.where(on_img[..., None], v, first_res_layer[k])
                    for k, v in res_layer.items()
                }
            ret_dicts.append(res_layer)

        query_heatmap_score = jnp.take_along_axis(
            heatmap.reshape(b, hb * wb, n_cls), top_pos[..., None], axis=1
        )  # [B, P, cls]

        if not ret_dicts:  # num_mmpi == 0 (lidar-only): the initial layer IS the output
            ret_dicts = [first_res_layer]

        # auxiliary: concat every layer along the proposal dim
        out = {
            k: jnp.concatenate([rd[k] for rd in ret_dicts], axis=1)
            for k in ret_dicts[0]
        }
        out["dense_heatmap"] = dense_heatmap_img
        out["query_heatmap_score"] = query_heatmap_score
        out["query_labels"] = top_cls
        out["on_image_masks"] = (
            jnp.stack(on_image_masks, 0)
            if on_image_masks
            else jnp.ones((0, b, p), bool)
        )  # [num_img_layers, B, P]
        return out
