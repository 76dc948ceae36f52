"""GT database creation + ObjectSample paste + Fading hook."""

import numpy as np
import pytest

from deepinteraction_tpu.data.gt_database import (
    ObjectSampler,
    create_gt_database,
    fading_active,
    points_in_box,
)


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    root = tmp_path_factory.mktemp("db")
    rng = np.random.default_rng(0)
    # one synthetic info: a box at (5, 0) stuffed with points + noise
    box = np.array([5.0, 0.0, -1.0, 2.0, 1.0, 1.5, 0.3], np.float32)
    inside = rng.uniform(-0.4, 0.4, size=(50, 5)).astype(np.float32)
    c, s = np.cos(box[6]), np.sin(box[6])
    rot = np.array([[c, -s], [s, c]], np.float32)
    inside[:, :2] = inside[:, :2] @ rot.T + box[:2]
    inside[:, 2] = rng.uniform(-0.9, 0.2, size=50)
    noise = rng.uniform(-20, 20, size=(200, 5)).astype(np.float32)
    pts = np.concatenate([inside, noise])
    cloud = root / "pc.bin"
    pts.tofile(str(cloud))
    info = {
        "token": "t0",
        "timestamp": 1_000_000,
        "lidar_path": str(cloud),
        "sweeps": [],
        "gt_boxes": box[None],
        "gt_names": np.asarray(["car"]),
        "gt_velocity": np.array([[1.0, 0.0]], np.float32),
    }
    path = create_gt_database([info], str(root), num_sweeps=0)
    return str(root), path, box


def test_points_in_box_rotated(db):
    _, _, box = db
    ctr = box.copy()
    p = np.array([[5.0, 0.0, -0.5, 0, 0], [15.0, 0.0, -0.5, 0, 0]], np.float32)
    m = points_in_box(p, ctr)
    assert m.tolist() == [True, False]


def test_database_contents(db):
    import pickle

    root, path, box = db
    with open(path, "rb") as f:
        index = pickle.load(f)
    assert "car" in index and len(index["car"]) == 1
    entry = index["car"][0]
    assert entry["num_points"] >= 40
    obj = np.fromfile(f"{root}/{entry['path']}", np.float32).reshape(-1, 5)
    # stored box-local: points near origin
    assert np.abs(obj[:, :2]).max() < 2.0


def test_object_sampler_pastes(db):
    root, path, box = db
    sampler = ObjectSampler(path, root, {"car": 3})
    rng = np.random.default_rng(1)
    pts = rng.uniform(-30, -10, size=(100, 5)).astype(np.float32)  # far away
    gt = np.zeros((0, 9), np.float32)
    labels = np.zeros((0,), np.int64)
    new_pts, new_gt, new_labels = sampler(pts, gt, labels, ("car",), rng)
    assert len(new_gt) == 1  # only one entry in the pool
    assert new_labels.tolist() == [0]
    assert len(new_pts) > len(pts)  # pasted points added
    np.testing.assert_allclose(new_gt[0, :7], box, atol=1e-5)
    np.testing.assert_allclose(new_gt[0, 7:9], [1.0, 0.0], atol=1e-6)


def test_sampler_respects_existing_counts_and_collisions(db):
    root, path, box = db
    sampler = ObjectSampler(path, root, {"car": 1})
    rng = np.random.default_rng(2)
    pts = np.zeros((10, 5), np.float32)
    # scene already has one car -> target met, nothing pasted
    gt = np.concatenate([box, [0, 0]])[None]
    labels = np.zeros((1,), np.int64)
    _, g2, _ = sampler(pts, gt, labels, ("car",), rng)
    assert len(g2) == 1
    # colliding box at the same spot -> candidate rejected
    sampler2 = ObjectSampler(path, root, {"car": 2})
    _, g3, _ = sampler2(pts, gt, labels, ("car",), rng)
    assert len(g3) == 1


def test_fading():
    assert fading_active(0, 4) and fading_active(3, 4)
    assert not fading_active(4, 4) and not fading_active(9, 4)
    assert fading_active(100, None)
