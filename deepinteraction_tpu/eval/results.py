"""Bridge: jitted model outputs + info pkls -> metric evaluation frames.

Mirrors mmdet3d's nuScenes result formatting (``NuScenesDataset
._format_bbox``): per-box default attribute selection by class + speed
(>0.2 m/s -> the 'moving' attribute), which feeds the AAE term of NDS.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .nuscenes_metrics import DetectionFrame

DEFAULT_ATTRIBUTES = {
    "car": "vehicle.parked",
    "truck": "vehicle.parked",
    "bus": "vehicle.stopped",
    "trailer": "vehicle.parked",
    "construction_vehicle": "vehicle.parked",
    "pedestrian": "pedestrian.standing",
    "motorcycle": "cycle.without_rider",
    "bicycle": "cycle.without_rider",
    "barrier": "",
    "traffic_cone": "",
}

MOVING_ATTRIBUTES = {
    "car": "vehicle.moving",
    "truck": "vehicle.moving",
    "bus": "vehicle.moving",
    "trailer": "vehicle.moving",
    "construction_vehicle": "vehicle.moving",
    "pedestrian": "pedestrian.moving",
    "motorcycle": "cycle.with_rider",
    "bicycle": "cycle.with_rider",
}


def default_attribute(name: str, speed: float) -> str:
    if speed > 0.2 and name in MOVING_ATTRIBUTES:
        return MOVING_ATTRIBUTES[name]
    return DEFAULT_ATTRIBUTES.get(name, "")


def ego_origin_in_lidar(info: dict) -> np.ndarray:
    """Position of the ego origin in the lidar frame.

    The devkit's class-range filter measures box distance from the EGO pose,
    not the lidar mount (~1 m apart on nuScenes); with this set on both GT
    and prediction frames the lidar-frame evaluation reproduces the official
    filter exactly. Returns zeros for infos predating the
    lidar2ego_{rotation,translation} fields."""
    rot = info.get("lidar2ego_rotation")
    t = info.get("lidar2ego_translation")
    if rot is None or t is None:
        return np.zeros(3)
    rot = np.asarray(rot, np.float64)
    t = np.asarray(t, np.float64)
    return -rot.T @ t


def predictions_to_frame(
    boxes: np.ndarray,  # [P, 9]
    scores: np.ndarray,  # [P]
    labels: np.ndarray,  # [P]
    keep: np.ndarray,  # [P] bool
    class_names: Sequence[str],
    info: dict | None = None,
) -> DetectionFrame:
    k = np.asarray(keep, bool)
    b = np.asarray(boxes)[k]
    s = np.asarray(scores)[k]
    l = np.asarray(labels)[k]
    names = np.asarray([class_names[int(i)] for i in l])
    vel = b[:, 7:9] if b.shape[1] >= 9 else np.zeros((len(b), 2))
    attrs = np.asarray(
        [default_attribute(n, float(np.linalg.norm(v))) for n, v in zip(names, vel)]
    )
    ego = ego_origin_in_lidar(info) if info is not None else np.zeros(3)
    return DetectionFrame(
        boxes=b[:, :7], velocity=vel, names=names, scores=s, attributes=attrs,
        ego_translation=ego,
    )


def gt_frame_from_info(info: dict) -> DetectionFrame:
    """Evaluation GT: boxes with >=1 lidar/radar point (devkit filter)."""
    valid = np.asarray(info.get("valid_flag", np.ones(len(info["gt_boxes"]), bool)))
    boxes = np.asarray(info["gt_boxes"], np.float64)[valid]
    vel = np.asarray(info["gt_velocity"], np.float64)[valid]
    names = np.asarray(info["gt_names"])[valid]
    attrs = info.get("gt_attributes")
    attrs = np.asarray(attrs)[valid] if attrs is not None else None
    return DetectionFrame(
        boxes=boxes, velocity=np.nan_to_num(vel), names=names, attributes=attrs,
        ego_translation=ego_origin_in_lidar(info),
    )
