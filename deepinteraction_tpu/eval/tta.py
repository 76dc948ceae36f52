"""Test-time augmentation (double-flip) + multi-model ensembling.

The reference's -large/-e entries use flip TTA and model ensembling
(README tables; the merge hook ``merge_aug_bboxes_3d`` is imported at
models/detectors/deepinteraction.py:9-10). TPU-native design: our model
consumes the fused ``lidar_aug`` matrix, so a TTA flip is just flipped
points + the flip folded into lidar_aug — the camera projection stays
consistent automatically (the jitted graph is reused, no aug-specific
recompile). Outputs are un-flipped on device and merged by per-class
weighted box fusion or NMS.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

FLIPS = ((False, False), (True, False), (False, True), (True, True))


def flip_batch(batch: Dict[str, np.ndarray], flip_x: bool, flip_y: bool):
    """Return a flipped copy of a detector batch.

    flip_x mirrors y := -y ('horizontal' BEV flip), flip_y mirrors x := -x,
    matching data/pipeline.random_flip.
    """
    out = dict(batch)
    f = np.eye(4, dtype=np.float32)
    pts = np.array(batch["points"])
    if flip_x:
        pts[..., 1] *= -1
        f[1, 1] = -1
    if flip_y:
        pts[..., 0] *= -1
        f[0, 0] = -1
    out["points"] = pts
    aug = np.asarray(batch["lidar_aug"])
    new_aug = np.einsum("ij,bjk->bik", f, aug)
    out["lidar_aug"] = new_aug.astype(np.float32)
    out["lidar_aug_inv"] = np.linalg.inv(new_aug.astype(np.float64)).astype(np.float32)
    return out


def unflip_boxes(boxes: np.ndarray, flip_x: bool, flip_y: bool) -> np.ndarray:
    """Map boxes predicted in a flipped frame back to the original frame."""
    b = np.array(boxes)
    if flip_x:
        b[..., 1] *= -1
        b[..., 6] = -b[..., 6]
        if b.shape[-1] >= 9:
            b[..., 8] *= -1
    if flip_y:
        b[..., 0] *= -1
        b[..., 6] = np.pi - b[..., 6]
        if b.shape[-1] >= 9:
            b[..., 7] *= -1
    return b


def merge_detections(
    boxes_list: Sequence[np.ndarray],  # each [N_i, >=7]
    scores_list: Sequence[np.ndarray],
    labels_list: Sequence[np.ndarray],
    radius: float = 0.5,
    max_out: int = 500,
):
    """Weighted box fusion across TTA variants / ensemble members.

    Clusters concatenated detections per class by BEV center distance
    (greedy, score-ordered, like circle-NMS) and score-weighted-averages
    each cluster's geometry; cluster score = max member score downweighted
    by (cluster size / num sources) as in standard WBF.
    """
    boxes = np.concatenate(boxes_list, 0)
    scores = np.concatenate(scores_list, 0)
    labels = np.concatenate(labels_list, 0)
    n_src = len(boxes_list)
    order = np.argsort(-scores)
    boxes, scores, labels = boxes[order], scores[order], labels[order]

    used = np.zeros(len(boxes), bool)
    out_boxes, out_scores, out_labels = [], [], []
    for i in range(len(boxes)):
        if used[i]:
            continue
        cls = labels[i]
        d = np.linalg.norm(boxes[:, :2] - boxes[i, :2], axis=1)
        members = (~used) & (labels == cls) & (d < radius)
        used |= members
        idx = np.where(members)[0]
        w = scores[idx][:, None]
        geo = np.sum(boxes[idx] * w, 0) / np.sum(w)
        # yaw averaged in sin/cos space to dodge wrap-around
        s = np.sum(np.sin(boxes[idx, 6]) * w[:, 0])
        c = np.sum(np.cos(boxes[idx, 6]) * w[:, 0])
        geo[6] = np.arctan2(s, c)
        out_boxes.append(geo)
        out_scores.append(float(scores[idx].max()) * min(len(idx), n_src) / n_src)
        out_labels.append(int(cls))
        if len(out_boxes) >= max_out:
            break
    return (
        np.asarray(out_boxes).reshape(-1, boxes.shape[1]),
        np.asarray(out_scores),
        np.asarray(out_labels, np.int64),
    )


def tta_inference(forward, variables, batch, flips=FLIPS, keep_threshold=0.0):
    """Run ``forward`` on every flip variant and fuse per example.

    ``forward(variables, batch) -> Detections`` (jitted; reused across
    variants since only input values change). Returns a LIST of
    ``(boxes, scores, labels)`` tuples, one per batch example — variants
    are fused within each example, never across examples.
    """
    per_ex: List = []
    for fx, fy in flips:
        det = forward(variables, flip_batch(batch, fx, fy))
        boxes = unflip_boxes(np.asarray(det.boxes), fx, fy)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        keep = np.asarray(det.keep) & (scores > keep_threshold)
        if not per_ex:
            per_ex = [([], [], []) for _ in range(boxes.shape[0])]
        for b in range(boxes.shape[0]):
            k = keep[b]
            per_ex[b][0].append(boxes[b][k])
            per_ex[b][1].append(scores[b][k])
            per_ex[b][2].append(labels[b][k])
    return [merge_detections(bl, sl, ll) for bl, sl, ll in per_ex]
