"""nuScenes detection metrics (mAP, ATE/ASE/AOE/AVE/AAE, NDS) — devkit-free.

The reference delegates evaluation to nuscenes-devkit via
``dataset.evaluate`` (tools/test.py:245). This is a standalone numpy
implementation of the official CVPR-2019 detection-metric algorithm
(devkit nuscenes/eval/detection): greedy score-ordered matching by BEV
center distance at thresholds {0.5, 1, 2, 4} m, 101-point interpolated
precision with (0.1, 0.1) min-recall/precision clamps, TP errors
accumulated at the 2 m threshold between min recall and the achieved max
recall, and NDS = (5·mAP + Σ max(0, 1 − err)) / 10.

Evaluation runs in the key-LiDAR frame: every term (center distance, size
IoU, yaw delta, speed delta, attribute match) is invariant under the rigid
lidar→global transform, so results match global-frame devkit evaluation.

Box layout everywhere: (x, y, z_bottom, dx, dy, dz, yaw) + velocity (vx, vy).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

# devkit eval config (detection_cvpr_2019.json)
DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_DIST_THRESHOLD = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
MAX_BOXES_PER_SAMPLE = 500
N_RECALL_SAMPLES = 101

CLASS_RANGE = {
    "car": 50.0,
    "truck": 50.0,
    "bus": 55.0,
    "trailer": 50.0,
    "construction_vehicle": 50.0,
    "pedestrian": 40.0,
    "motorcycle": 40.0,
    "bicycle": 40.0,
    "traffic_cone": 30.0,
    "barrier": 30.0,
}

# classes with no orientation / velocity / attribute in the official metric
NO_ORIENTATION = ("traffic_cone",)
ORIENTATION_PERIOD_PI = ("barrier",)
NO_VELOCITY = ("barrier", "traffic_cone")
NO_ATTRIBUTE = ("barrier", "traffic_cone")

TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")


@dataclass
class DetectionFrame:
    """Per-sample boxes, predictions or ground truth, in the lidar frame."""

    boxes: np.ndarray  # [N, 7]
    velocity: np.ndarray  # [N, 2]
    names: np.ndarray  # [N] str
    scores: Optional[np.ndarray] = None  # [N] predictions only
    attributes: Optional[np.ndarray] = None  # [N] str ('' = none)
    ego_translation: np.ndarray = field(
        default_factory=lambda: np.zeros(3)
    )  # lidar origin; range filter measures from here

    def filtered(self, name: str, max_range: float):
        m = self.names == name
        if m.any():
            d = np.linalg.norm(
                self.boxes[:, :2] - self.ego_translation[None, :2], axis=1
            )
            m = m & (d < max_range)
        idx = np.where(m)[0]
        return idx


def _yaw_diff(a: np.ndarray, b: np.ndarray, period: float) -> np.ndarray:
    d = (a - b) % period
    return np.minimum(d, period - d)


def _aligned_iou3d(b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    """IoU of center- and yaw-aligned boxes (devkit scale_iou): min-dim overlap."""
    inter = np.prod(np.minimum(b1[..., 3:6], b2[..., 3:6]), axis=-1)
    v1 = np.prod(b1[..., 3:6], axis=-1)
    v2 = np.prod(b2[..., 3:6], axis=-1)
    return inter / np.maximum(v1 + v2 - inter, 1e-9)


def _accumulate(
    gts: Sequence[DetectionFrame],
    preds: Sequence[DetectionFrame],
    class_name: str,
    dist_th: float,
) -> Optional[dict]:
    """devkit ``accumulate``: one class, one threshold, whole split."""
    max_range = CLASS_RANGE[class_name]
    npos = 0
    gt_sel: List[np.ndarray] = []
    for g in gts:
        idx = g.filtered(class_name, max_range)
        gt_sel.append(idx)
        npos += len(idx)
    if npos == 0:
        return None

    rows = []  # (score, sample_i, pred_j)
    for si, p in enumerate(preds):
        idx = p.filtered(class_name, max_range)
        if p.scores is not None and len(idx):
            order = np.argsort(-p.scores[idx])
            idx = idx[order][:MAX_BOXES_PER_SAMPLE]
        for j in idx:
            rows.append((float(p.scores[j]), si, int(j)))
    rows.sort(key=lambda r: -r[0])

    taken = [set() for _ in gts]
    tp, fp, conf = [], [], []
    match_data = {k: [] for k in TP_METRICS}
    match_data["conf"] = []
    for score, si, j in rows:
        p = preds[si]
        pb = p.boxes[j]
        best, best_gi = np.inf, None
        for gi in gt_sel[si]:
            if gi in taken[si]:
                continue
            d = np.linalg.norm(gts[si].boxes[gi, :2] - pb[:2])
            if d < best:
                best, best_gi = d, gi
        if best < dist_th:
            taken[si].add(best_gi)
            tp.append(1)
            fp.append(0)
            conf.append(score)
            g = gts[si]
            gb = g.boxes[best_gi]
            match_data["trans_err"].append(best)
            match_data["scale_err"].append(1.0 - _aligned_iou3d(pb, gb))
            if class_name in NO_ORIENTATION:
                match_data["orient_err"].append(0.0)
            else:
                period = np.pi if class_name in ORIENTATION_PERIOD_PI else 2 * np.pi
                match_data["orient_err"].append(
                    float(_yaw_diff(pb[6], gb[6], period))
                )
            if class_name in NO_VELOCITY:
                match_data["vel_err"].append(0.0)
            else:
                match_data["vel_err"].append(
                    float(np.linalg.norm(p.velocity[j] - g.velocity[best_gi]))
                )
            if class_name in NO_ATTRIBUTE or g.attributes is None:
                match_data["attr_err"].append(0.0)
            else:
                ga = g.attributes[best_gi]
                pa = p.attributes[j] if p.attributes is not None else ""
                # devkit attr_acc: GT without an attribute contributes NaN
                # and is excluded from the cummean (not counted as correct)
                match_data["attr_err"].append(
                    np.nan if ga == "" else (0.0 if pa == ga else 1.0)
                )
            match_data["conf"].append(score)
        else:
            tp.append(0)
            fp.append(1)
            conf.append(score)

    if len(match_data["conf"]) == 0:
        return {
            "recall": np.zeros(N_RECALL_SAMPLES),
            "precision": np.zeros(N_RECALL_SAMPLES),
            "confidence": np.zeros(N_RECALL_SAMPLES),
            **{k: np.ones(N_RECALL_SAMPLES) for k in TP_METRICS},
            "npos": npos,
        }

    tp_c = np.cumsum(tp).astype(np.float64)
    fp_c = np.cumsum(fp).astype(np.float64)
    conf = np.asarray(conf)
    prec = tp_c / np.maximum(tp_c + fp_c, 1)
    rec = tp_c / npos
    rec_interp = np.linspace(0, 1, N_RECALL_SAMPLES)
    prec_i = np.interp(rec_interp, rec, prec, right=0)
    conf_i = np.interp(rec_interp, rec, conf, right=0)
    out = {"recall": rec_interp, "precision": prec_i, "confidence": conf_i, "npos": npos}
    # TP errors: cummean over matches, interpolated onto the recall grid by
    # descending confidence (devkit: cummean then interp over conf)
    for k in TP_METRICS:
        arr = np.asarray(match_data[k], np.float64)
        cm = _cummean(arr)
        mconf = np.asarray(match_data["conf"])
        # interp needs ascending x
        out[k] = np.interp(conf_i[::-1], mconf[::-1], cm[::-1])[::-1]
    return out


def _cummean(x: np.ndarray) -> np.ndarray:
    """devkit ``cummean``: NaN-aware running mean (NaN entries — e.g.
    attribute-less GT matches — are excluded from both sum and count);
    all-NaN input returns ones."""
    nan = np.isnan(x)
    if nan.all():
        return np.ones(len(x))
    cnt = np.cumsum(~nan).astype(np.float64)
    return np.nancumsum(x) / np.maximum(cnt, 1.0)


def _calc_ap(md: dict) -> float:
    prec = md["precision"].copy()
    prec = prec[round(100 * MIN_RECALL) + 1 :]
    prec -= MIN_PRECISION
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - MIN_PRECISION)


def _calc_tp(md: dict, metric: str) -> float:
    first = round(100 * MIN_RECALL) + 1
    # last achieved recall index (devkit: max recall w/ nonzero confidence)
    nz = np.nonzero(md["confidence"])[0]
    if len(nz) == 0:
        return 1.0
    last = int(nz[-1]) + 1
    if last <= first:
        return 1.0
    return float(np.mean(md[metric][first:last]))


def evaluate_detections(
    gts: Sequence[DetectionFrame],
    preds: Sequence[DetectionFrame],
    class_names: Sequence[str],
) -> Dict[str, float]:
    """Full-split evaluation. Returns the devkit summary scalars:
    per-class AP, mAP, mean TP errors, NDS."""
    assert len(gts) == len(preds)
    metrics: Dict[str, float] = {}
    aps = []
    tp_errs = {k: [] for k in TP_METRICS}
    for name in class_names:
        cls_aps = []
        for th in DIST_THRESHOLDS:
            md = _accumulate(gts, preds, name, th)
            if md is None:
                continue
            ap = _calc_ap(md)
            cls_aps.append(ap)
            if th == TP_DIST_THRESHOLD:
                for k in TP_METRICS:
                    if (
                        (k == "orient_err" and name in NO_ORIENTATION)
                        or (k == "vel_err" and name in NO_VELOCITY)
                        or (k == "attr_err" and name in NO_ATTRIBUTE)
                    ):
                        continue
                    tp_errs[k].append(_calc_tp(md, k))
        if cls_aps:
            metrics[f"AP_{name}"] = float(np.mean(cls_aps))
            aps.append(np.mean(cls_aps))
    mAP = float(np.mean(aps)) if aps else 0.0
    metrics["mAP"] = mAP
    acronym = {
        "trans_err": "mATE",
        "scale_err": "mASE",
        "orient_err": "mAOE",
        "vel_err": "mAVE",
        "attr_err": "mAAE",
    }
    nds_total = 5.0 * mAP
    for k in TP_METRICS:
        err = float(np.mean(tp_errs[k])) if tp_errs[k] else 1.0
        metrics[acronym[k]] = err
        nds_total += max(1.0 - min(1.0, err), 0.0)
    metrics["NDS"] = nds_total / 10.0
    return metrics
