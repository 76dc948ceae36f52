"""Training target assignment + total loss, fully batched and jittable.

Rebuild of the reference's ``get_targets`` / ``loss``
(deepinteraction_decoder.py:315-547) and ``HungarianAssigner3D``
(core/bbox/assigners/hungarian_assigner.py:92-153). Differences by design:

- per-sample/per-layer Python loops -> one [B, L, P, G] cost tensor; one
  batched LAP host callback (ops/hungarian.py) replaces L×B scipy calls
  with device-side cost construction (incl. rotated IoU, which the
  reference computes in CUDA).
- GT boxes arrive padded to a static G with a mask.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..configs import AssignerConfig, BBoxCoderConfig, DecoderConfig
from ..ops.gaussian import draw_heatmap, gaussian_radius
from ..ops.hungarian import hungarian_assign
from ..ops.rotated_iou import iou_3d
from .coder import TransFusionBBoxCoder
from .losses import clip_sigmoid, gaussian_focal_loss, sigmoid_focal_loss, weighted_l1_loss

BIG = 1e8


class Targets(NamedTuple):
    labels: jnp.ndarray  # [B, L*P] int
    label_weights: jnp.ndarray  # [B, L*P]
    bbox_targets: jnp.ndarray  # [B, L*P, code_size]
    bbox_weights: jnp.ndarray  # [B, L*P, code_size]
    ious: jnp.ndarray  # [B, L*P]
    heatmap: jnp.ndarray  # [B, ncls, Hb, Wb]
    mean_iou: jnp.ndarray  # []


def _focal_cls_cost(scores, labels, gmask, alpha, gamma, weight):
    """mmdet FocalLossCost. scores [P, C] sigmoid; labels [G]."""
    eps = 1e-12
    neg = -jnp.log(1.0 - scores + eps) * (1.0 - alpha) * scores**gamma
    pos = -jnp.log(scores + eps) * alpha * (1.0 - scores) ** gamma
    cost = (pos - neg)[:, labels]  # [P, G]
    return jnp.where(gmask[None, :], cost * weight, BIG)


def build_targets(
    preds: Dict[str, jnp.ndarray],
    gt_boxes: jnp.ndarray,  # [B, G, 9]
    gt_labels: jnp.ndarray,  # [B, G]
    gt_mask: jnp.ndarray,  # [B, G]
    dcfg: DecoderConfig,
    ccfg: BBoxCoderConfig,
    acfg: AssignerConfig,
    bev_shape: Tuple[int, int],
) -> Targets:
    coder = TransFusionBBoxCoder(ccfg)
    p = preds["center"].shape[1] // max(dcfg.num_mmpi, 1)
    nl = max(dcfg.num_mmpi, 1)  # num_mmpi=0 (lidar-only): one output layer
    b, g = gt_boxes.shape[0], gt_boxes.shape[1]
    ncls = dcfg.num_classes

    stop = jax.lax.stop_gradient
    layer = lambda t: stop(t.reshape(b, nl, p, t.shape[-1]))
    dec = coder.decode(
        {
            "center": layer(preds["center"]),
            "height": layer(preds["height"]),
            "dim": layer(preds["dim"]),
            "rot": layer(preds["rot"]),
            "vel": layer(preds["vel"]),
            "heatmap": layer(preds["heatmap"]),
        }
    )
    boxes = dec.boxes  # [B, L, P, 9]
    scores = jax.nn.sigmoid(layer(preds["heatmap"]))  # [B, L, P, ncls]

    pcr = ccfg.pc_range
    full_range = jnp.asarray(
        [pcr[0], pcr[1]]
    )
    # BBoxBEVL1Cost: centers normalized by the full pc range
    # (hungarian_assigner.py:29-36). Range extent derives from the coder grid.
    extent = jnp.asarray(
        [
            bev_shape[1] * ccfg.voxel_size[0] * ccfg.out_size_factor,
            bev_shape[0] * ccfg.voxel_size[1] * ccfg.out_size_factor,
        ]
    )

    def per_bl(boxes_l, scores_l, gtb, gtl, gm):
        nb = (boxes_l[:, :2] - full_range) / extent
        ng = (gtb[:, :2] - full_range) / extent
        reg = jnp.sum(jnp.abs(nb[:, None] - ng[None, :]), -1) * acfg.reg_cost_weight
        iou = iou_3d(boxes_l[:, :7], gtb[:, :7])
        iou_c = -iou * acfg.iou_cost_weight
        cls_c = _focal_cls_cost(
            scores_l, gtl, gm, acfg.cls_cost_alpha, acfg.cls_cost_gamma, acfg.cls_cost_weight
        )
        cost = jnp.where(gm[None, :], cls_c + reg + iou_c, BIG)
        return cost, iou

    cost, iou = jax.vmap(
        lambda bl, sl, gtb, gtl, gm: jax.vmap(
            lambda b2, s2: per_bl(b2, s2, gtb, gtl, gm)
        )(bl, sl)
    )(boxes, scores, gt_boxes, gt_labels, gt_mask)  # [B, L, P, G] both

    num_gt = jnp.sum(gt_mask.astype(jnp.int32), -1)  # [B]
    assign = hungarian_assign(
        cost, jnp.broadcast_to(num_gt[:, None], (b, nl)), impl=acfg.lap_impl
    )
    # [B, L, P] col index or -1
    matched = assign >= 0
    safe = jnp.maximum(assign, 0)

    enc = coder.encode(gt_boxes)  # [B, G, code]
    code = enc.shape[-1]
    take = lambda arr, idx: jnp.take_along_axis(arr, idx, axis=1)
    bbox_t = jax.vmap(
        lambda e, a: e[a.reshape(-1)].reshape(nl, p, code)
    )(enc, safe)
    bbox_t = jnp.where(matched[..., None], bbox_t, 0.0)
    bbox_w = jnp.where(matched[..., None], 1.0, 0.0) * jnp.ones((code,))
    labels_t = jax.vmap(lambda l, a: l[a.reshape(-1)].reshape(nl, p))(gt_labels, safe)
    labels_t = jnp.where(matched, labels_t, ncls)
    label_w = jnp.ones((b, nl, p))  # pos_weight <= 0 -> all ones
    iou_t = jnp.take_along_axis(iou, safe[..., None], axis=-1)[..., 0]
    iou_t = jnp.clip(jnp.where(matched, iou_t, 0.0), 0.0, 1.0)

    # dense heatmap target
    hb, wb = bev_shape
    sx = ccfg.voxel_size[0] * ccfg.out_size_factor
    sy = ccfg.voxel_size[1] * ccfg.out_size_factor

    def hm_one(gtb, gtl, gm):
        w = gtb[:, 3] / sx
        l = gtb[:, 4] / sy
        ok = gm & (w > 0) & (l > 0)
        radius = gaussian_radius((l, w), dcfg.gaussian_overlap)
        radius = jnp.maximum(
            jnp.asarray(dcfg.min_radius, jnp.int32), radius.astype(jnp.int32)
        )
        cx = (gtb[:, 0] - pcr[0]) / sx
        cy = (gtb[:, 1] - pcr[1]) / sy
        return draw_heatmap(
            jnp.stack([cx, cy], -1), radius, gtl, ok,
            num_classes=ncls, height=hb, width=wb,
        )

    heatmap = jax.vmap(hm_one)(gt_boxes, gt_labels, gt_mask)

    npos = jnp.sum(matched)
    mean_iou = jnp.sum(iou_t) / jnp.maximum(npos, 1)
    return Targets(
        labels=labels_t.reshape(b, nl * p),
        label_weights=label_w.reshape(b, nl * p),
        bbox_targets=bbox_t.reshape(b, nl * p, code),
        bbox_weights=bbox_w.reshape(b, nl * p, code),
        ious=iou_t.reshape(b, nl * p),
        heatmap=heatmap,
        mean_iou=mean_iou,
    )


def heuristic_assign(
    boxes: jnp.ndarray,  # [P, >=2] predicted boxes (BEV centers used)
    gt_boxes: jnp.ndarray,  # [G, >=2]
    gt_mask: jnp.ndarray,  # [G]
    pred_labels: jnp.ndarray | None = None,  # [P] int
    gt_labels: jnp.ndarray | None = None,  # [G] int
    dist_thre: float = 100.0,
) -> jnp.ndarray:
    """Nearest-center fallback assigner (reference ``HeuristicAssigner3D``,
    core/bbox/assigners/hungarian_assigner.py:49-89): each GT claims its
    nearest prediction (same-class when labels given, within ``dist_thre``
    metres); a prediction contested by several GTs keeps the closest.

    Returns [P] int32 matched GT index or -1 — fully on-device, jittable.
    """
    p = boxes.shape[0]
    d = jnp.linalg.norm(
        gt_boxes[:, None, :2] - boxes[None, :, :2], axis=-1
    )  # [G, P]
    if pred_labels is not None and gt_labels is not None:
        d = d + (gt_labels[:, None] != pred_labels[None, :]) * dist_thre
    d = jnp.where(gt_mask[:, None], d, jnp.inf)
    nearest = jnp.argmin(d, axis=1)  # [G] pred per gt
    nearest_d = jnp.min(d, axis=1)
    ok = gt_mask & (nearest_d <= dist_thre)
    # contested predictions keep the closest GT: scatter-min distances,
    # then a GT wins iff it achieves that minimum
    best = jnp.full((p,), jnp.inf).at[jnp.where(ok, nearest, p)].min(
        jnp.where(ok, nearest_d, jnp.inf), mode="drop"
    )
    wins = ok & (nearest_d == best[jnp.clip(nearest, 0, p - 1)])
    g = gt_boxes.shape[0]
    # exact-distance ties resolve to the SMALLEST gt index (the reference's
    # strict-< sequential update keeps the first)
    assign = jnp.full((p,), g, jnp.int32).at[
        jnp.where(wins, nearest, p)
    ].min(jnp.where(wins, jnp.arange(g, dtype=jnp.int32), g), mode="drop")
    return jnp.where(assign == g, -1, assign)


def detection_loss(
    preds: Dict[str, jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    dcfg: DecoderConfig,
    ccfg: BBoxCoderConfig,
    acfg: AssignerConfig,
    bev_shape: Tuple[int, int],
) -> Dict[str, jnp.ndarray]:
    """Full head loss (reference deepinteraction_decoder.py:484-547)."""
    t = build_targets(preds, gt_boxes, gt_labels, gt_mask, dcfg, ccfg, acfg, bev_shape)
    nl = max(dcfg.num_mmpi, 1)
    p = preds["center"].shape[1] // nl
    b = gt_boxes.shape[0]

    label_w = t.label_weights.reshape(b, nl, p)
    bbox_w = t.bbox_weights.reshape(b, nl, p, -1)
    om = preds["on_image_masks"].astype(jnp.float32)
    if om.shape[0] == 0:
        pass  # lidar-only: no image layers, no masking
    elif om.shape[0] == nl:
        # ++: cumulative mask applied to EVERY layer
        # (deepinteractionplusplus_decoder.py:511-515)
        masks = jnp.transpose(om, (1, 0, 2))  # [B, nl, P]
        label_w = label_w * masks
        bbox_w = bbox_w * masks[..., None]
    else:
        # v1: even (image) layers only; off-image queries carry no loss
        # (deepinteraction_decoder.py:504-509); on_image_masks is [nl//2, B, P]
        for li in range(0, nl, 2):
            label_w = label_w.at[:, li].multiply(om[li // 2])
            bbox_w = bbox_w.at[:, li].multiply(om[li // 2][..., None])

    losses: Dict[str, jnp.ndarray] = {}
    hm_pred = clip_sigmoid(preds["dense_heatmap"])  # [B, Hb, Wb, ncls]
    hm_tgt = jnp.transpose(t.heatmap, (0, 2, 3, 1))
    losses["loss_heatmap"] = dcfg.loss_heatmap_weight * gaussian_focal_loss(
        hm_pred, hm_tgt, jnp.sum((hm_tgt == 1.0).astype(jnp.float32))
    )

    labels = t.labels.reshape(b, nl, p)
    bbox_t = t.bbox_targets.reshape(b, nl, p, -1)
    code_w = jnp.asarray(dcfg.code_weights)
    heat = preds["heatmap"].reshape(b, nl, p, -1)
    reg_parts = jnp.concatenate(
        [preds["center"], preds["height"], preds["dim"], preds["rot"], preds["vel"]],
        axis=-1,
    ).reshape(b, nl, p, -1)
    total = 0.0
    for li in range(nl):
        npos = jnp.sum(jnp.max(bbox_w[:, li], -1))
        lcls = dcfg.loss_cls_weight * sigmoid_focal_loss(
            heat[:, li], labels[:, li], label_w[:, li], npos,
            dcfg.loss_cls_gamma, dcfg.loss_cls_alpha,
        )
        lbox = dcfg.loss_bbox_weight * weighted_l1_loss(
            reg_parts[:, li], bbox_t[:, li], bbox_w[:, li] * code_w, npos
        )
        losses[f"layer_{li}_loss_cls"] = lcls
        losses[f"layer_{li}_loss_bbox"] = lbox
        total = total + lcls + lbox
    losses["matched_ious"] = t.mean_iou
    losses["loss_total"] = total + losses["loss_heatmap"]
    return losses
