"""Inference post-processing: predictions dict -> scored boxes.

Reference: ``DeepInteractionDecoder.get_bboxes``
(deepinteraction_decoder.py:549-638). Fully jittable: returns fixed-size
arrays + a keep mask instead of ragged lists; NMS (off by default, as in the
shipped configs) runs on-device via ops/nms.py.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from .configs import BBoxCoderConfig, DecoderConfig
from .ops.nms import circle_nms, rotated_nms
from .targets.coder import TransFusionBBoxCoder

# nuScenes per-class NMS tasks (deepinteraction_decoder.py:575-580)
NUSC_TASKS = (
    {"indices": tuple(range(8)), "radius": -1.0},
    {"indices": (8,), "radius": 0.175},
    {"indices": (9,), "radius": 0.175},
)


class Detections(NamedTuple):
    boxes: jnp.ndarray  # [B, P, 9]
    scores: jnp.ndarray  # [B, P]
    labels: jnp.ndarray  # [B, P]
    keep: jnp.ndarray  # [B, P] bool


def get_bboxes(
    preds: Dict[str, jnp.ndarray],
    dcfg: DecoderConfig,
    ccfg: BBoxCoderConfig,
    num_proposals: int,
) -> Detections:
    coder = TransFusionBBoxCoder(ccfg)
    p = num_proposals
    last = lambda t: t[:, -p:]
    ncls = dcfg.num_classes
    one_hot = jax.nn.one_hot(preds["query_labels"], ncls)
    score = (
        jax.nn.sigmoid(last(preds["heatmap"]))
        * preds["query_heatmap_score"]
        * one_hot
    )
    dec = coder.decode(
        {
            "center": last(preds["center"]),
            "height": last(preds["height"]),
            "dim": last(preds["dim"]),
            "rot": last(preds["rot"]),
            "vel": last(preds["vel"]),
            "heatmap": score,
        }
    )
    keep = dec.in_range

    if dcfg.nms_type is not None:
        def nms_one(boxes, scores, labels, valid):
            km = jnp.zeros_like(valid)
            for task in NUSC_TASKS:
                tmask = jnp.zeros_like(valid)
                for ci in task["indices"]:
                    tmask = tmask | (labels == ci)
                tmask = tmask & valid
                if task["radius"] <= 0:
                    km = km | tmask
                elif dcfg.nms_type == "circle":
                    k = circle_nms(boxes[:, :2], scores, tmask, task["radius"])
                    km = km | (k & tmask)
                else:
                    k = rotated_nms(
                        boxes, scores, tmask, task["radius"], dcfg.pre_maxsize
                    )
                    km = km | (k & tmask)
            return km

        keep = jax.vmap(nms_one)(dec.boxes, dec.scores, dec.labels, keep)

    return Detections(dec.boxes, dec.scores, dec.labels, keep)
