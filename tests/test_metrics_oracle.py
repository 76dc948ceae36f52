"""Randomized cross-check of eval/nuscenes_metrics.py against an
independently-written oracle of the official devkit algorithm
(nuscenes/eval/detection/algo.py: accumulate + calc_ap + calc_tp).

The devkit itself is not installable offline, so the oracle re-derives the
published algorithm with a deliberately different code structure (per-sample
dict state, explicit loops, no shared helpers with the implementation under
test) — a coding slip in either side shows up as a mismatch on the
randomized scenes (VERDICT round-1 weak #4 / next #9).
"""

import numpy as np
import pytest

from deepinteraction_tpu.eval.nuscenes_metrics import (
    CLASS_RANGE,
    DIST_THRESHOLDS,
    MIN_PRECISION,
    MIN_RECALL,
    NO_ATTRIBUTE,
    NO_ORIENTATION,
    NO_VELOCITY,
    ORIENTATION_PERIOD_PI,
    TP_DIST_THRESHOLD,
    TP_METRICS,
    DetectionFrame,
    evaluate_detections,
)


# ---------------------------------------------------------------- oracle --
def _oracle_evaluate(gts, preds, class_names):
    """Straight transcription of the devkit algorithm, structured as one
    flat function over (class, threshold)."""
    results = {}
    aps_by_class = {}
    tp_by_metric = {k: [] for k in TP_METRICS}
    for cls in class_names:
        rng_max = CLASS_RANGE[cls]

        def in_range(frame, i):
            d = np.hypot(
                frame.boxes[i, 0] - frame.ego_translation[0],
                frame.boxes[i, 1] - frame.ego_translation[1],
            )
            return d < rng_max

        # GT count after range filter
        npos = sum(
            1
            for g in gts
            for i in range(len(g.names))
            if g.names[i] == cls and in_range(g, i)
        )
        if npos == 0:
            continue

        # all predictions of this class, sorted by confidence desc
        cand = []
        for si, p in enumerate(preds):
            for j in range(len(p.names)):
                if p.names[j] == cls and in_range(p, j):
                    cand.append((float(p.scores[j]), si, j))
        cand.sort(key=lambda t: -t[0])

        cls_aps = []
        for th in DIST_THRESHOLDS:
            taken = set()
            tp, fp, conf = [], [], []
            md = {k: [] for k in TP_METRICS}
            md_conf = []
            for score, si, j in cand:
                g = gts[si]
                best_d, best_i = np.inf, None
                for gi in range(len(g.names)):
                    if g.names[gi] != cls or not in_range(g, gi):
                        continue
                    if (si, gi) in taken:
                        continue
                    d = np.hypot(
                        g.boxes[gi, 0] - preds[si].boxes[j, 0],
                        g.boxes[gi, 1] - preds[si].boxes[j, 1],
                    )
                    if d < best_d:
                        best_d, best_i = d, gi
                if best_i is not None and best_d < th:
                    taken.add((si, best_i))
                    tp.append(1)
                    fp.append(0)
                    conf.append(score)
                    pb, gb = preds[si].boxes[j], g.boxes[best_i]
                    md["trans_err"].append(best_d)
                    minwlh = np.minimum(pb[3:6], gb[3:6])
                    inter = minwlh[0] * minwlh[1] * minwlh[2]
                    union = (
                        pb[3] * pb[4] * pb[5] + gb[3] * gb[4] * gb[5] - inter
                    )
                    md["scale_err"].append(1.0 - inter / union)
                    if cls in NO_ORIENTATION:
                        md["orient_err"].append(0.0)
                    else:
                        per = np.pi if cls in ORIENTATION_PERIOD_PI else 2 * np.pi
                        dy = abs(pb[6] - gb[6]) % per
                        md["orient_err"].append(min(dy, per - dy))
                    if cls in NO_VELOCITY:
                        md["vel_err"].append(0.0)
                    else:
                        md["vel_err"].append(
                            float(
                                np.hypot(
                                    preds[si].velocity[j, 0] - g.velocity[best_i, 0],
                                    preds[si].velocity[j, 1] - g.velocity[best_i, 1],
                                )
                            )
                        )
                    if cls in NO_ATTRIBUTE or g.attributes is None:
                        md["attr_err"].append(0.0)
                    else:
                        ga = g.attributes[best_i]
                        pa = (
                            preds[si].attributes[j]
                            if preds[si].attributes is not None
                            else ""
                        )
                        md["attr_err"].append(
                            np.nan if ga == "" else float(pa != ga)
                        )
                    md_conf.append(score)
                else:
                    tp.append(0)
                    fp.append(1)
                    conf.append(score)

            rec_grid = np.linspace(0, 1, 101)
            if len(md_conf) == 0:
                prec_i = np.zeros(101)
                conf_i = np.zeros(101)
                md_i = {k: np.ones(101) for k in TP_METRICS}
            else:
                tpc = np.cumsum(tp).astype(float)
                fpc = np.cumsum(fp).astype(float)
                prec = tpc / (tpc + fpc)
                rec = tpc / npos
                prec_i = np.interp(rec_grid, rec, prec, right=0)
                conf_i = np.interp(rec_grid, rec, np.asarray(conf), right=0)
                md_i = {}
                for k in TP_METRICS:
                    arr = np.asarray(md[k], float)
                    # devkit cummean (NaN-aware)
                    isn = np.isnan(arr)
                    if isn.all():
                        cm = np.ones(len(arr))
                    else:
                        cm = np.nancumsum(arr) / np.maximum(
                            np.cumsum(~isn).astype(float), 1.0
                        )
                    md_i[k] = np.interp(
                        conf_i[::-1], np.asarray(md_conf)[::-1], cm[::-1]
                    )[::-1]

            # calc_ap
            pr = prec_i.copy()[round(100 * MIN_RECALL) + 1 :]
            pr = np.maximum(pr - MIN_PRECISION, 0)
            cls_aps.append(float(np.mean(pr)) / (1 - MIN_PRECISION))

            if th == TP_DIST_THRESHOLD:
                first = round(100 * MIN_RECALL) + 1
                nz = np.nonzero(conf_i)[0]
                for k in TP_METRICS:
                    if (
                        (k == "orient_err" and cls in NO_ORIENTATION)
                        or (k == "vel_err" and cls in NO_VELOCITY)
                        or (k == "attr_err" and cls in NO_ATTRIBUTE)
                    ):
                        continue
                    if len(nz) == 0 or int(nz[-1]) < first:
                        tp_by_metric[k].append(1.0)
                    else:
                        tp_by_metric[k].append(
                            float(np.mean(md_i[k][first : int(nz[-1]) + 1]))
                        )
        aps_by_class[cls] = float(np.mean(cls_aps))

    if aps_by_class:
        results["mAP"] = float(np.mean(list(aps_by_class.values())))
    else:
        results["mAP"] = 0.0
    for k, name in (
        ("trans_err", "mATE"),
        ("scale_err", "mASE"),
        ("orient_err", "mAOE"),
        ("vel_err", "mAVE"),
        ("attr_err", "mAAE"),
    ):
        results[name] = (
            float(np.mean(tp_by_metric[k])) if tp_by_metric[k] else 1.0
        )
    nds = 5 * results["mAP"] + sum(
        max(1 - min(1.0, results[n]), 0.0)
        for n in ("mATE", "mASE", "mAOE", "mAVE", "mAAE")
    )
    results["NDS"] = nds / 10.0
    for c, ap in aps_by_class.items():
        results[f"AP_{c}"] = ap
    return results


# ----------------------------------------------------------------- scenes --
CLASSES = ("car", "pedestrian", "barrier", "traffic_cone", "bicycle")
ATTRS = {
    "car": ["vehicle.moving", "vehicle.parked", ""],
    "pedestrian": ["pedestrian.moving", "pedestrian.standing", ""],
    "bicycle": ["cycle.with_rider", "cycle.without_rider", ""],
    "barrier": [""],
    "traffic_cone": [""],
}


def _random_frame(rng, n, with_scores):
    names = rng.choice(CLASSES, n)
    boxes = np.column_stack(
        [
            rng.uniform(-60, 60, n),  # spans the class-range boundary
            rng.uniform(-60, 60, n),
            rng.uniform(-2, 1, n),
            rng.uniform(0.3, 5, n),
            rng.uniform(0.3, 3, n),
            rng.uniform(0.5, 3, n),
            rng.uniform(-np.pi, np.pi, n),
        ]
    )
    vel = rng.normal(0, 3, (n, 2))
    attrs = np.asarray([rng.choice(ATTRS[c]) for c in names])
    return DetectionFrame(
        boxes=boxes,
        velocity=vel,
        names=names,
        scores=rng.uniform(0, 1, n) if with_scores else None,
        attributes=attrs,
        ego_translation=rng.normal(0, 1, 3),
    )


def _perturbed_preds(rng, g):
    """Predictions = noisy GT (some matchable) + pure false positives."""
    n = len(g.names)
    keep = rng.random(n) < 0.8
    boxes = g.boxes[keep] + rng.normal(0, 1.2, (keep.sum(), 7))
    boxes[:, 3:6] = np.maximum(boxes[:, 3:6], 0.1)  # sizes stay physical
    names = g.names[keep]
    vel = g.velocity[keep] + rng.normal(0, 0.5, (keep.sum(), 2))
    attrs = np.asarray(
        [a if rng.random() < 0.7 else rng.choice(ATTRS[c]) for a, c in zip(g.attributes[keep], names)]
    )
    nf = rng.integers(0, 5)
    f = _random_frame(rng, int(nf), with_scores=True)
    return DetectionFrame(
        boxes=np.vstack([boxes, f.boxes]),
        velocity=np.vstack([vel, f.velocity]),
        names=np.concatenate([names, f.names]),
        scores=rng.uniform(0, 1, len(names) + nf),
        attributes=np.concatenate([attrs, f.attributes]),
        ego_translation=g.ego_translation,
    )


@pytest.mark.parametrize("seed", range(5))
def test_randomized_scenes_match_oracle(seed):
    rng = np.random.default_rng(seed)
    gts, preds = [], []
    for _ in range(20):
        g = _random_frame(rng, int(rng.integers(0, 14)), with_scores=False)
        gts.append(g)
        preds.append(_perturbed_preds(rng, g))
    got = evaluate_detections(gts, preds, list(CLASSES))
    want = _oracle_evaluate(gts, preds, list(CLASSES))
    for key, w in want.items():
        assert got[key] == pytest.approx(w, abs=1e-9), (key, got[key], w)


def test_empty_predictions_match_oracle():
    rng = np.random.default_rng(99)
    gts = [_random_frame(rng, 6, with_scores=False) for _ in range(4)]
    empty = DetectionFrame(
        boxes=np.zeros((0, 7)),
        velocity=np.zeros((0, 2)),
        names=np.asarray([], dtype=str),
        scores=np.zeros(0),
        attributes=np.asarray([], dtype=str),
    )
    preds = [empty] * 4
    got = evaluate_detections(gts, preds, list(CLASSES))
    want = _oracle_evaluate(gts, preds, list(CLASSES))
    assert got["mAP"] == want["mAP"] == 0.0
    assert got["NDS"] == pytest.approx(want["NDS"])
