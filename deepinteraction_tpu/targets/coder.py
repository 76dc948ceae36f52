"""TransFusion box codec, batched channels-last JAX port.

Reference: core/bbox/coders/transfusion_bbox_coder.py. Box layout is
(x, y, z_bottom, dx, dy, dz, yaw, vx, vy); network heads predict
center (feature-grid units), gravity-center z, log dims, (sin, cos) yaw.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

from ..configs import BBoxCoderConfig


class DecodedBoxes(NamedTuple):
    boxes: jnp.ndarray  # [..., P, 9]
    scores: jnp.ndarray  # [..., P]
    labels: jnp.ndarray  # [..., P] int32
    in_range: jnp.ndarray  # [..., P] bool (post_center_range + score filter)


class TransFusionBBoxCoder:
    def __init__(self, cfg: BBoxCoderConfig):
        self.cfg = cfg

    def encode(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """[..., G, >=7] real-world boxes -> [..., G, code_size] targets."""
        c = self.cfg
        sx = c.out_size_factor * c.voxel_size[0]
        sy = c.out_size_factor * c.voxel_size[1]
        t = [
            (boxes[..., 0] - c.pc_range[0]) / sx,
            (boxes[..., 1] - c.pc_range[1]) / sy,
            boxes[..., 2] + boxes[..., 5] * 0.5,  # bottom -> gravity z
            jnp.log(jnp.maximum(boxes[..., 3], 1e-9)),
            jnp.log(jnp.maximum(boxes[..., 4], 1e-9)),
            jnp.log(jnp.maximum(boxes[..., 5], 1e-9)),
            jnp.sin(boxes[..., 6]),
            jnp.cos(boxes[..., 6]),
        ]
        if self.cfg.code_size == 10:
            t += [boxes[..., 7], boxes[..., 8]]
        return jnp.stack(t, axis=-1)

    def decode(self, preds: Dict[str, jnp.ndarray]) -> DecodedBoxes:
        """preds: channels-last dict with center [..., P, 2], height [..., P, 1],
        dim [..., P, 3], rot [..., P, 2] (sin, cos), vel [..., P, 2],
        heatmap [..., P, num_classes] (logits)."""
        c = self.cfg
        hm = preds["heatmap"]
        labels = jnp.argmax(hm, axis=-1).astype(jnp.int32)
        scores = jnp.max(hm, axis=-1)

        sx = c.out_size_factor * c.voxel_size[0]
        sy = c.out_size_factor * c.voxel_size[1]
        x = preds["center"][..., 0] * sx + c.pc_range[0]
        y = preds["center"][..., 1] * sy + c.pc_range[1]
        dims = jnp.exp(preds["dim"])
        z = preds["height"][..., 0] - dims[..., 2] * 0.5  # gravity -> bottom
        yaw = jnp.arctan2(preds["rot"][..., 0], preds["rot"][..., 1])
        parts = [x, y, z, dims[..., 0], dims[..., 1], dims[..., 2], yaw]
        if "vel" in preds and preds["vel"] is not None:
            parts += [preds["vel"][..., 0], preds["vel"][..., 1]]
        boxes = jnp.stack(parts, axis=-1)

        pcr = jnp.asarray(c.post_center_range)
        ctr = boxes[..., :3]
        in_range = jnp.all(ctr >= pcr[:3], -1) & jnp.all(ctr <= pcr[3:], -1)
        if c.score_threshold is not None:
            in_range = in_range & (scores > c.score_threshold)
        return DecodedBoxes(boxes, scores, labels, in_range)
