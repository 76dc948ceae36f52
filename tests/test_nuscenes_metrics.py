"""nuScenes metric implementation against hand-computable cases.

The devkit AP definition: 101-point interpolated precision, recall below
0.1 and precision below 0.1 clipped out, normalized by 0.9.
"""

import numpy as np

from deepinteraction_tpu.eval.nuscenes_metrics import (
    DetectionFrame,
    evaluate_detections,
)
from deepinteraction_tpu.eval.results import default_attribute, predictions_to_frame

CLASSES = ("car", "pedestrian")


def frame(centers, name="car", scores=None, vel=None, yaw=0.0, attrs=None):
    n = len(centers)
    boxes = np.zeros((n, 7))
    boxes[:, :2] = np.asarray(centers, np.float64).reshape(n, 2)
    boxes[:, 2] = -1.0
    boxes[:, 3:6] = (4.0, 2.0, 1.5)
    boxes[:, 6] = yaw
    return DetectionFrame(
        boxes=boxes,
        velocity=np.zeros((n, 2)) if vel is None else np.asarray(vel, np.float64),
        names=np.asarray([name] * n),
        scores=None if scores is None else np.asarray(scores, np.float64),
        attributes=attrs if attrs is None else np.asarray(attrs),
    )


def test_perfect_predictions():
    centers = [(5.0, 0.0), (10.0, 3.0), (-7.0, 2.0)]
    gt = frame(centers)
    pred = frame(centers, scores=[0.9, 0.8, 0.7])
    m = evaluate_detections([gt], [pred], ("car",))
    assert m["AP_car"] > 0.99
    assert m["mATE"] < 1e-6 and m["mASE"] < 1e-6 and m["mAOE"] < 1e-6
    assert abs(m["NDS"] - 1.0) < 1e-6


def test_half_recall_ap():
    gt = frame([(5.0, 0.0), (20.0, 0.0)])
    pred = frame([(5.0, 0.0)], scores=[0.9])  # one of two GTs found
    m = evaluate_detections([gt], [pred], ("car",))
    # precision 1 up to recall 0.5 -> AP = 40 * 0.9 / 90 / 0.9 = 0.4444
    np.testing.assert_allclose(m["AP_car"], 40.0 / 90.0, atol=1e-6)


def test_false_positives_zero_ap():
    gt = frame([(5.0, 0.0)])
    pred = frame([(30.0, 30.0)], scores=[0.9])  # far from GT at every thresh
    m = evaluate_detections([gt], [pred], ("car",))
    assert m["AP_car"] == 0.0
    assert m["NDS"] <= 0.5  # TP errors default to 1 when nothing matches


def test_translation_error_measured():
    gt = frame([(5.0, 0.0)])
    pred = frame([(5.0, 1.2)], scores=[0.9])  # matches at 2m/4m thresholds
    m = evaluate_detections([gt], [pred], ("car",))
    np.testing.assert_allclose(m["mATE"], 1.2, atol=1e-6)
    assert 0 < m["AP_car"] < 1.0  # matched at 2 of 4 thresholds


def test_orientation_and_velocity_errors():
    gt = frame([(5.0, 0.0)], vel=[(1.0, 0.0)])
    pred = frame([(5.0, 0.0)], scores=[0.9], vel=[(3.0, 0.0)], yaw=np.pi / 4)
    m = evaluate_detections([gt], [pred], ("car",))
    np.testing.assert_allclose(m["mAOE"], np.pi / 4, atol=1e-6)
    np.testing.assert_allclose(m["mAVE"], 2.0, atol=1e-6)


def test_attribute_error():
    gt = frame([(5.0, 0.0)], attrs=["vehicle.moving"])
    pred_good = frame([(5.0, 0.0)], scores=[0.9], attrs=["vehicle.moving"])
    pred_bad = frame([(5.0, 0.0)], scores=[0.9], attrs=["vehicle.parked"])
    m_good = evaluate_detections([gt], [pred_good], ("car",))
    m_bad = evaluate_detections([gt], [pred_bad], ("car",))
    assert m_good["mAAE"] == 0.0 and m_bad["mAAE"] == 1.0


def test_range_filter_drops_far_boxes():
    gt = frame([(60.0, 0.0)])  # beyond the 50 m car range
    pred = frame([(60.0, 0.0)], scores=[0.9])
    m = evaluate_detections([gt], [pred], ("car",))
    assert "AP_car" not in m  # class skipped: no in-range GT
    assert m["mAP"] == 0.0


def test_multiclass_and_default_attrs():
    gt = [
        frame([(5.0, 0.0)], name="car"),
        frame([(3.0, 1.0)], name="pedestrian"),
    ]
    preds = [
        frame([(5.0, 0.0)], name="car", scores=[0.9]),
        frame([(3.0, 1.0)], name="pedestrian", scores=[0.8]),
    ]
    m = evaluate_detections(gt, preds, CLASSES)
    assert m["AP_car"] > 0.99 and m["AP_pedestrian"] > 0.99
    assert default_attribute("car", 1.0) == "vehicle.moving"
    assert default_attribute("car", 0.0) == "vehicle.parked"
    assert default_attribute("traffic_cone", 5.0) == ""


def test_predictions_to_frame_keep_mask():
    boxes = np.zeros((4, 9))
    boxes[:, 3:6] = 1.0
    boxes[2, 7] = 1.0  # moving
    f = predictions_to_frame(
        boxes,
        scores=np.array([0.9, 0.8, 0.7, 0.6]),
        labels=np.array([0, 0, 0, 1]),
        keep=np.array([True, False, True, True]),
        class_names=CLASSES,
    )
    assert len(f.boxes) == 3
    assert f.attributes[1] == "vehicle.moving"  # speed 1.0
    assert f.names.tolist() == ["car", "car", "pedestrian"]
