"""Offline nuScenes info generation — devkit-free.

Rebuild of ``tools/data_converter/nuscenes_converter.py`` (reference
``create_nuscenes_infos``, L26+) plus the subset of nuscenes-devkit it leans
on: this version reads the raw nuScenes JSON tables directly (sample,
sample_data, ego_pose, calibrated_sensor, sensor, sample_annotation,
instance, category, scene, log) so the framework has no dependency on the
devkit for data preparation. The emitted per-sample info dict carries the
same fields the reference consumes (lidar_path, sweeps<=10 with
sensor2lidar transforms, per-camera intrinsics + sensor2lidar — the extra
fields of the reference's CustomNuScenesDataset, nuscenes_dataset.py:50-83 —
and gt boxes/names/velocities).

Output box convention (documented; used consistently across the framework):
(x, y, z_bottom, dx, dy, dz, yaw, vx, vy) in the key LiDAR frame, yaw CCW
around +z measured from +x.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np

# nuScenes detection-challenge category mapping (devkit
# eval/detection/utils.py category_to_detection_name)
NAME_MAPPING = {
    "movable_object.barrier": "barrier",
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.car": "car",
    "vehicle.construction": "construction_vehicle",
    "vehicle.motorcycle": "motorcycle",
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "human.pedestrian.police_officer": "pedestrian",
    "movable_object.trafficcone": "traffic_cone",
    "vehicle.trailer": "trailer",
    "vehicle.truck": "truck",
}

CAM_ORDER = (
    "CAM_FRONT",
    "CAM_FRONT_RIGHT",
    "CAM_FRONT_LEFT",
    "CAM_BACK",
    "CAM_BACK_LEFT",
    "CAM_BACK_RIGHT",
)

# official train/val scene split sizes are enforced by scene names coming
# from the devkit splits; here we split by the scene list in the table and
# an explicit split file can override.


def quat_to_rot(q: np.ndarray) -> np.ndarray:
    """nuScenes quaternion (w, x, y, z) -> 3x3 rotation matrix."""
    w, x, y, z = q
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0.0 else 2.0 / n
    return np.array(
        [
            [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
            [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
            [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
        ],
        dtype=np.float64,
    )


def quat_yaw(q: np.ndarray) -> float:
    """Yaw of the box frame's +x axis in the parent frame."""
    r = quat_to_rot(q)
    return float(np.arctan2(r[1, 0], r[0, 0]))


class Tables:
    """Raw nuScenes JSON tables with token indices."""

    def __init__(self, data_root: str, version: str):
        self.root = data_root
        base = os.path.join(data_root, version)
        for name in (
            "sample",
            "sample_data",
            "ego_pose",
            "calibrated_sensor",
            "sensor",
            "sample_annotation",
            "instance",
            "category",
            "scene",
            "log",
            "attribute",
        ):
            path = os.path.join(base, f"{name}.json")
            if name == "attribute" and not os.path.exists(path):
                setattr(self, name, {})
                continue
            with open(path) as f:
                rows = json.load(f)
            setattr(self, name, {r["token"]: r for r in rows})
        # sample -> its sample_datas / annotations
        self.sample_to_data: Dict[str, List[dict]] = {}
        for sd in self.sample_data.values():
            self.sample_to_data.setdefault(sd["sample_token"], []).append(sd)
        self.sample_to_anns: Dict[str, List[dict]] = {}
        for a in self.sample_annotation.values():
            self.sample_to_anns.setdefault(a["sample_token"], []).append(a)

    def pose(self, sd: dict) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(R_ego_global, t_ego, R_sensor_ego, t_sensor) for a sample_data."""
        ego = self.ego_pose[sd["ego_pose_token"]]
        cal = self.calibrated_sensor[sd["calibrated_sensor_token"]]
        return (
            quat_to_rot(np.asarray(ego["rotation"])),
            np.asarray(ego["translation"], np.float64),
            quat_to_rot(np.asarray(cal["rotation"])),
            np.asarray(cal["translation"], np.float64),
        )

    def sensor_channel(self, sd: dict) -> str:
        cal = self.calibrated_sensor[sd["calibrated_sensor_token"]]
        return self.sensor[cal["sensor_token"]]["channel"]


def _sensor2lidar(
    tables: Tables, sd: dict, l_r_eg: np.ndarray, l_t_e: np.ndarray,
    l_r_ge: np.ndarray, l_t_g: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """sensor->key-lidar rotation/translation (composing through global).

    Args carry the key lidar's (R_sensor_ego, t_sensor, R_ego_global, t_ego).
    """
    s_r_ge, s_t_g, s_r_eg, s_t_e = tables.pose(sd)
    # sensor -> ego -> global
    r_sg = s_r_ge @ s_r_eg
    t_sg = s_r_ge @ s_t_e + s_t_g
    # global -> key ego -> key lidar
    r_gl = (l_r_ge @ l_r_eg).T
    t_gl = -r_gl @ (l_r_ge @ l_t_e + l_t_g)
    return r_gl @ r_sg, r_gl @ t_sg + t_gl


def _box_velocity(tables: Tables, ann: dict, max_time_diff: float = 1.5) -> np.ndarray:
    """Global-frame velocity from neighbouring annotations (devkit
    ``box_velocity`` semantics)."""
    has_prev = bool(ann["prev"])
    has_next = bool(ann["next"])
    if not has_prev and not has_next:
        return np.array([np.nan, np.nan, np.nan])
    first = tables.sample_annotation[ann["prev"]] if has_prev else ann
    last = tables.sample_annotation[ann["next"]] if has_next else ann
    pos_first = np.asarray(first["translation"], np.float64)
    pos_last = np.asarray(last["translation"], np.float64)
    t_first = tables.sample[first["sample_token"]]["timestamp"] / 1e6
    t_last = tables.sample[last["sample_token"]]["timestamp"] / 1e6
    if t_last - t_first > max_time_diff:
        return np.array([np.nan, np.nan, np.nan])
    return (pos_last - pos_first) / max(t_last - t_first, 1e-6)


def sample_info(
    tables: Tables, sample: dict, max_sweeps: int = 10, with_anns: bool = True
) -> dict:
    lidar_sd = None
    cams: Dict[str, dict] = {}
    for sd in tables.sample_to_data[sample["token"]]:
        if not sd["is_key_frame"]:
            continue
        ch = tables.sensor_channel(sd)
        if ch == "LIDAR_TOP":
            lidar_sd = sd
        elif ch in CAM_ORDER:
            cams[ch] = sd
    assert lidar_sd is not None, f"sample {sample['token']} has no LIDAR_TOP"
    l_r_ge, l_t_g, l_r_eg, l_t_e = tables.pose(lidar_sd)

    info = {
        "token": sample["token"],
        "timestamp": lidar_sd["timestamp"],
        "lidar_path": os.path.join(tables.root, lidar_sd["filename"]),
        "sweeps": [],
        "cams": {},
        # lidar->ego extrinsics: the devkit's class-range filter measures
        # distance from the EGO origin, which sits ~1 m from the lidar
        # mount; eval needs these to reproduce the official filter exactly
        "lidar2ego_rotation": l_r_eg,
        "lidar2ego_translation": l_t_e,
    }

    # non-keyframe sweeps, walking prev links (reference sweeps<=10)
    sd = lidar_sd
    while len(info["sweeps"]) < max_sweeps and sd["prev"]:
        sd = tables.sample_data[sd["prev"]]
        r, t = _sensor2lidar(tables, sd, l_r_eg, l_t_e, l_r_ge, l_t_g)
        info["sweeps"].append(
            {
                "data_path": os.path.join(tables.root, sd["filename"]),
                "timestamp": sd["timestamp"],
                "sensor2lidar_rotation": r,
                "sensor2lidar_translation": t,
            }
        )

    for ch in CAM_ORDER:
        sd = cams[ch]
        cal = tables.calibrated_sensor[sd["calibrated_sensor_token"]]
        r, t = _sensor2lidar(tables, sd, l_r_eg, l_t_e, l_r_ge, l_t_g)
        info["cams"][ch] = {
            "data_path": os.path.join(tables.root, sd["filename"]),
            "cam_intrinsic": np.asarray(cal["camera_intrinsic"], np.float64),
            "sensor2lidar_rotation": r,
            "sensor2lidar_translation": t,
        }

    if with_anns:
        boxes, names, vels, npts, valid, attrs = [], [], [], [], [], []
        r_gl = (l_r_ge @ l_r_eg).T
        t_gl = -r_gl @ (l_r_ge @ l_t_e + l_t_g)
        for ann in tables.sample_to_anns.get(sample["token"], []):
            inst = tables.instance[ann["instance_token"]]
            cat = tables.category[inst["category_token"]]["name"]
            name = NAME_MAPPING.get(cat)
            if name is None:
                continue
            ctr_g = np.asarray(ann["translation"], np.float64)
            ctr = r_gl @ ctr_g + t_gl
            w, l, h = ann["size"]  # nuScenes: (width=y, length=x, height=z)
            yaw_g = quat_yaw(np.asarray(ann["rotation"]))
            # rotate yaw from global into lidar frame
            x_axis_g = np.array([np.cos(yaw_g), np.sin(yaw_g), 0.0])
            x_axis_l = r_gl @ x_axis_g
            yaw = float(np.arctan2(x_axis_l[1], x_axis_l[0]))
            vel_g = _box_velocity(tables, ann)
            vel = r_gl @ np.nan_to_num(vel_g)
            boxes.append([ctr[0], ctr[1], ctr[2] - h / 2.0, l, w, h, yaw])
            names.append(name)
            vels.append([vel[0], vel[1]])
            npts.append(ann["num_lidar_pts"])
            valid.append(ann["num_lidar_pts"] + ann["num_radar_pts"] > 0)
            toks = ann.get("attribute_tokens", ())
            attrs.append(
                tables.attribute[toks[0]]["name"] if toks else ""
            )
        info["gt_boxes"] = np.asarray(boxes, np.float64).reshape(-1, 7)
        info["gt_attributes"] = np.asarray(attrs)
        info["gt_names"] = np.asarray(names)
        info["gt_velocity"] = np.asarray(vels, np.float64).reshape(-1, 2)
        info["num_lidar_pts"] = np.asarray(npts, np.int64)
        info["valid_flag"] = np.asarray(valid, bool)
    return info


def create_nuscenes_infos(
    data_root: str,
    out_dir: str,
    version: str = "v1.0-trainval",
    max_sweeps: int = 10,
    val_scene_names: Optional[set] = None,
) -> Tuple[str, str]:
    """Walk the tables and write ``nuscenes_infos_{train,val}.pkl``
    (reference tools/create_data.py:47-82)."""
    from .splits import val_scenes as default_val_scenes

    tables = Tables(data_root, version)
    if val_scene_names is None:
        val_scene_names = default_val_scenes(version, data_root)
    train_infos, val_infos = [], []
    for scene in tables.scene.values():
        is_val = scene["name"] in val_scene_names
        tok = scene["first_sample_token"]
        while tok:
            sample = tables.sample[tok]
            info = sample_info(tables, sample, max_sweeps=max_sweeps)
            (val_infos if is_val else train_infos).append(info)
            tok = sample["next"]
    train_infos.sort(key=lambda i: i["timestamp"])
    val_infos.sort(key=lambda i: i["timestamp"])

    os.makedirs(out_dir, exist_ok=True)
    suffix = "" if version == "v1.0-trainval" else "_" + version.split("-")[-1]
    paths = []
    for split, infos in (("train", train_infos), ("val", val_infos)):
        path = os.path.join(out_dir, f"nuscenes_infos{suffix}_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump({"infos": infos, "metadata": {"version": version}}, f)
        paths.append(path)
    return tuple(paths)
