"""Write a tiny synthetic raw nuScenes tree (JSON tables + .bin + .jpg).

Public utility for demos, verification drives, and tests: produces a
dataset the offline converter (data/nuscenes_converter.py) accepts, with a
6-camera rig, keyframe LiDAR + one intermediate sweep, and two annotated
instances per sample moving at 1 m/s along +x.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..data.nuscenes_converter import CAM_ORDER, quat_to_rot

PTS_PER_CLOUD = 500


def _rot_to_quat(rot: np.ndarray) -> list:
    """3x3 proper rotation -> (w, x, y, z) quaternion."""
    w = np.sqrt(max(0.0, 1 + rot[0, 0] + rot[1, 1] + rot[2, 2])) / 2
    if w > 1e-6:
        q = [
            w,
            (rot[2, 1] - rot[1, 2]) / (4 * w),
            (rot[0, 2] - rot[2, 0]) / (4 * w),
            (rot[1, 0] - rot[0, 1]) / (4 * w),
        ]
    else:
        d = np.diag(rot)
        k = int(np.argmax(d))
        x = np.sqrt(max(0.0, 1 + 2 * d[k] - d.sum())) / 2
        q3 = [0.0, 0.0, 0.0]
        q3[k] = x
        off = [(2, 1), (0, 2), (1, 0)]
        q = [0.0] + q3
        for j in range(3):
            if j != k:
                a, b = off[j]
                q[j + 1] = (rot[a, b] + rot[b, a]) / (4 * x) if x > 0 else 0.0
        q[0] = (rot[off[k][0], off[k][1]] - rot[off[k][1], off[k][0]]) / (4 * x)
    np.testing.assert_allclose(quat_to_rot(np.asarray(q)), rot, atol=1e-6)
    return [float(v) for v in q]


def _write_cloud(path: str, rng: np.random.Generator, n: int = PTS_PER_CLOUD):
    pts = rng.uniform(-6, 6, size=(n, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 2, size=n)
    pts[:, 4] = 0
    pts.tofile(path)


def write_synthetic_nuscenes(
    root: str,
    num_samples: int = 3,
    version: str = "v1.0-mini",
    scene_name: str = "scene-9001",
    seed: int = 0,
    image_hw: tuple = (24, 32),
) -> str:
    import cv2

    os.makedirs(f"{root}/{version}", exist_ok=True)
    rng = np.random.default_rng(seed)

    ident = [1.0, 0.0, 0.0, 0.0]
    sensors = [{"token": "sen_lidar", "channel": "LIDAR_TOP", "modality": "lidar"}]
    cals = [
        {
            "token": "cal_lidar",
            "sensor_token": "sen_lidar",
            "rotation": ident,
            "translation": [0.0, 0.0, 1.8],
            "camera_intrinsic": [],
        }
    ]
    for i, cam in enumerate(CAM_ORDER):
        sensors.append({"token": f"sen_{cam}", "channel": cam, "modality": "camera"})
        ang = 2 * np.pi * i / 6
        # columns are the camera axes in the ego frame: x=(sin,-cos,0) right,
        # y=(0,0,-1) down, z=(cos,sin,0) forward (proper rotation, det=+1)
        rot = np.array(
            [
                [np.sin(ang), 0.0, np.cos(ang)],
                [-np.cos(ang), 0.0, np.sin(ang)],
                [0.0, -1.0, 0.0],
            ]
        )
        cals.append(
            {
                "token": f"cal_{cam}",
                "sensor_token": f"sen_{cam}",
                "rotation": _rot_to_quat(rot),
                "translation": [0.0, 0.0, 1.5],
                "camera_intrinsic": [
                    [20.0, 0.0, 16.0],
                    [0.0, 20.0, 12.0],
                    [0.0, 0.0, 1.0],
                ],
            }
        )

    samples, sample_datas, ego_poses, anns = [], [], [], []
    h, w = image_hw
    img = (rng.uniform(0, 255, size=(h, w, 3))).astype(np.uint8)
    for s in range(num_samples):
        stok = f"sample{s}"
        ts = 1_000_000 * (s + 1)
        samples.append(
            {
                "token": stok,
                "timestamp": ts,
                "scene_token": "scene0",
                "prev": f"sample{s-1}" if s > 0 else "",
                "next": f"sample{s+1}" if s < num_samples - 1 else "",
            }
        )
        ego_poses.append(
            {
                "token": f"ego{s}",
                "rotation": ident,
                "translation": [float(s), 0.0, 0.0],
                "timestamp": ts,
            }
        )
        lp = f"samples/LIDAR_TOP/pc{s}.bin"
        os.makedirs(os.path.dirname(f"{root}/{lp}"), exist_ok=True)
        _write_cloud(f"{root}/{lp}", rng)
        sample_datas.append(
            {
                "token": f"sd_lidar{s}",
                "sample_token": stok,
                "ego_pose_token": f"ego{s}",
                "calibrated_sensor_token": "cal_lidar",
                "filename": lp,
                "is_key_frame": True,
                "timestamp": ts,
                "prev": f"sd_sweep{s}" if s > 0 else "",
                "next": "",
            }
        )
        if s > 0:
            sp = f"sweeps/LIDAR_TOP/sw{s}.bin"
            os.makedirs(os.path.dirname(f"{root}/{sp}"), exist_ok=True)
            _write_cloud(f"{root}/{sp}", rng)
            sample_datas.append(
                {
                    "token": f"sd_sweep{s}",
                    "sample_token": stok,
                    "ego_pose_token": f"ego{s}",
                    "calibrated_sensor_token": "cal_lidar",
                    "filename": sp,
                    "is_key_frame": False,
                    "timestamp": ts - 50_000,
                    "prev": "",
                    "next": f"sd_lidar{s}",
                }
            )
        for cam in CAM_ORDER:
            ip = f"samples/{cam}/img{s}.jpg"
            os.makedirs(os.path.dirname(f"{root}/{ip}"), exist_ok=True)
            cv2.imwrite(f"{root}/{ip}", img)
            sample_datas.append(
                {
                    "token": f"sd_{cam}{s}",
                    "sample_token": stok,
                    "ego_pose_token": f"ego{s}",
                    "calibrated_sensor_token": f"cal_{cam}",
                    "filename": ip,
                    "is_key_frame": True,
                    "timestamp": ts,
                    "prev": "",
                    "next": "",
                    # real nuScenes camera sample_datas carry these
                    "width": w,
                    "height": h,
                }
            )
        for a in range(2):
            anns.append(
                {
                    "token": f"ann{s}_{a}",
                    "sample_token": stok,
                    "instance_token": f"inst{a}",
                    "translation": [2.0 + s + a, 1.0 - a, 0.5],
                    "size": [1.8, 4.2, 1.6],  # (w, l, h)
                    "rotation": ident,
                    "prev": f"ann{s-1}_{a}" if s > 0 else "",
                    "next": f"ann{s+1}_{a}" if s < num_samples - 1 else "",
                    "num_lidar_pts": 10,
                    "num_radar_pts": 0,
                }
            )
    tables = {
        "sample": samples,
        "sample_data": sample_datas,
        "ego_pose": ego_poses,
        "calibrated_sensor": cals,
        "sensor": sensors,
        "sample_annotation": anns,
        "instance": [
            {"token": "inst0", "category_token": "cat_car"},
            {"token": "inst1", "category_token": "cat_ped"},
        ],
        "category": [
            {"token": "cat_car", "name": "vehicle.car"},
            {"token": "cat_ped", "name": "human.pedestrian.adult"},
        ],
        "scene": [
            {
                "token": "scene0",
                "name": scene_name,
                "first_sample_token": "sample0",
                "log_token": "log0",
            }
        ],
        "log": [{"token": "log0", "location": "synthetic"}],
    }
    for name, rows in tables.items():
        with open(f"{root}/{version}/{name}.json", "w") as f:
            json.dump(rows, f)
    return root
