"""2D annotation export (data/anno_2d.py vs reference
tools/data_converter/nuscenes_converter.py:334-625)."""

import json
import os
import pickle

import numpy as np
import pytest

from deepinteraction_tpu.data.anno_2d import (
    _convex_hull,
    export_2d_annotation,
    post_process_coords,
)


def test_convex_hull_square():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.7]])
    hull = _convex_hull(pts)
    assert len(hull) == 4
    assert set(map(tuple, hull)) == {(0, 0), (2, 0), (2, 2), (0, 2)}


def test_post_process_coords_clipping():
    # box half outside the 10x10 canvas -> clipped at the border
    corners = np.array([[-5.0, 2.0], [5.0, 2.0], [5.0, 8.0], [-5.0, 8.0]])
    assert post_process_coords(corners, (10, 10)) == (0.0, 2.0, 5.0, 8.0)
    # fully outside -> None
    assert post_process_coords(corners - 100.0, (10, 10)) is None
    # rotated triangle partially inside
    tri = np.array([[-1.0, 5.0], [3.0, -1.0], [4.0, 6.0]])
    x1, y1, x2, y2 = post_process_coords(tri, (10, 10))
    assert 0.0 <= x1 < x2 <= 10 and 0.0 <= y1 < y2 <= 10


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from deepinteraction_tpu.data.nuscenes_converter import create_nuscenes_infos
    from deepinteraction_tpu.utils.synthetic_nuscenes import write_synthetic_nuscenes

    root = str(tmp_path_factory.mktemp("nusc2d"))
    write_synthetic_nuscenes(root, num_samples=3, seed=0)
    train, val = create_nuscenes_infos(root, root, version="v1.0-mini")
    return root, train


def test_export_2d_schema_and_geometry(synth):
    root, info_path = synth
    out = export_2d_annotation(root, info_path, "v1.0-mini", mono3d=True)
    assert out.endswith("_mono3d.coco.json") and os.path.exists(out)
    with open(out) as f:
        coco = json.load(f)
    assert {c["name"] for c in coco["categories"]} >= {"car", "pedestrian"}
    with open(info_path, "rb") as f:
        infos = pickle.load(f)["infos"]
    # one images entry per (sample, camera)
    assert len(coco["images"]) == len(infos) * 6
    img = coco["images"][0]
    for key in ("cam_intrinsic", "cam2ego_rotation", "ego2global_rotation",
                "width", "height"):
        assert key in img
    assert len(coco["annotations"]) > 0
    ids = [a["id"] for a in coco["annotations"]]
    assert ids == list(range(len(ids)))

    by_img = {i["id"]: i for i in coco["images"]}
    for a in coco["annotations"]:
        img = by_img[a["image_id"]]
        x, y, w, h = a["bbox"]
        assert 0 <= x <= x + w <= img["width"] + 1e-6
        assert 0 <= y <= y + h <= img["height"] + 1e-6
        assert a["area"] == pytest.approx(w * h)
        assert a["category_name"] in {c["name"] for c in coco["categories"]}
        # mono3d extras (center-vs-bbox consistency is pinned exactly by
        # test_projection_against_manual; here boxes may straddle the image
        # plane, where only in-front corners project — devkit semantics)
        assert len(a["bbox_cam3d"]) == 7
        assert a["center2d"][2] > 0  # depth-positive filter
        assert len(a["velo_cam3d"]) == 2


def test_export_2d_no_mono3d(synth):
    root, info_path = synth
    out = export_2d_annotation(root, info_path, "v1.0-mini", mono3d=False)
    assert out.endswith(".coco.json") and "_mono3d" not in out
    with open(out) as f:
        coco = json.load(f)
    for a in coco["annotations"]:
        assert "bbox_cam3d" not in a


def test_projection_against_manual():
    """Exporter geometry vs a hand-built pinhole projection."""
    from deepinteraction_tpu.data.anno_2d import get_2d_boxes
    from deepinteraction_tpu.data.nuscenes_converter import Tables

    class T:
        """Minimal Tables stub: identity ego pose, cam looking down +z=+x."""

        def __init__(self):
            k = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
            # cam->ego: x_cam=-y_ego (right), y_cam=-z_ego (down), z_cam=+x_ego
            # (columns of R_cam_ego are the cam axes in ego coordinates)
            r = np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])
            self.calibrated_sensor = {
                "cal": {"camera_intrinsic": k.tolist(), "rotation": None}
            }
            self._r_se = r
            self.sample_to_anns = {
                "s": [
                    {
                        "token": "a",
                        "sample_token": "s",
                        "instance_token": "i",
                        "translation": [10.0, 0.0, 0.0],
                        "size": [2.0, 4.0, 2.0],  # w, l, h
                        "rotation": [1.0, 0, 0, 0],
                        "visibility_token": "4",
                        "prev": "",
                        "next": "",
                        "attribute_tokens": (),
                    }
                ]
            }
            self.instance = {"i": {"category_token": "c"}}
            self.category = {"c": {"name": "vehicle.car"}}
            self.sample = {"s": {"timestamp": 0}}
            self.sample_annotation = {}
            self.attribute = {}

        def pose(self, sd):
            return np.eye(3), np.zeros(3), self._r_se, np.zeros(3)

    sd = {
        "is_key_frame": True,
        "calibrated_sensor_token": "cal",
        "sample_token": "s",
        "token": "sd",
        "filename": "f.jpg",
        "width": 100,
        "height": 100,
    }
    recs = get_2d_boxes(T(), sd, ("4",), mono3d=True)
    assert len(recs) == 1
    r = recs[0]
    # box at 10 m straight ahead, 2 m wide -> x spans 100*(+-1/z)+50;
    # nearest face z=8, farthest z=12: widest extent 100*(1/8)=12.5 px
    x1, y1, x2, y2 = r["bbox_corners"]
    assert x1 == pytest.approx(50 - 12.5) and x2 == pytest.approx(50 + 12.5)
    assert y1 == pytest.approx(50 - 12.5) and y2 == pytest.approx(50 + 12.5)
    assert r["center2d"][:2] == pytest.approx([50.0, 50.0])
    assert r["center2d"][2] == pytest.approx(10.0)
    # cam-frame center: x right=0, y down=0, z forward=10
    assert r["bbox_cam3d"][:3] == pytest.approx([0.0, 0.0, 10.0])
    # dims recorded [l, h, w]
    assert r["bbox_cam3d"][3:6] == pytest.approx([4.0, 2.0, 2.0])
