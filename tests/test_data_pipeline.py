"""Data subsystem: devkit-free converter, online pipeline, CBGS, loader.

Builds a tiny synthetic nuScenes on disk (raw JSON tables + .bin clouds +
.jpg images), converts it to info pkls, and runs the full host pipeline —
the integration surface the reference never tests (SURVEY §4).
"""

import dataclasses

import numpy as np
import pytest

from deepinteraction_tpu.configs import tiny_config
from deepinteraction_tpu.data.dataset import NuScenesDataset, cbgs_indices
from deepinteraction_tpu.data.loader import DataLoader
from deepinteraction_tpu.data.nuscenes_converter import create_nuscenes_infos

NUM_SAMPLES = 3


@pytest.fixture(scope="module")
def fake_nuscenes(tmp_path_factory):
    from deepinteraction_tpu.utils.synthetic_nuscenes import write_synthetic_nuscenes

    root = str(tmp_path_factory.mktemp("nusc"))
    return write_synthetic_nuscenes(root, num_samples=NUM_SAMPLES)


@pytest.fixture(scope="module")
def infos_paths(fake_nuscenes, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("infos"))
    return create_nuscenes_infos(fake_nuscenes, out, version="v1.0-mini", max_sweeps=2)


@pytest.fixture(scope="module")
def data_cfg():
    cfg = tiny_config()
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, img_scale=(64, 32), num_views=6, max_points=2048, max_gt_boxes=8
        ),
    )


def test_converter_fields(infos_paths):
    from deepinteraction_tpu.data.dataset import load_infos

    train_path, val_path = infos_paths
    infos = load_infos(train_path)
    assert len(infos) == NUM_SAMPLES
    info = infos[-1]
    assert len(info["cams"]) == 6
    assert len(info["sweeps"]) >= 1
    assert info["gt_boxes"].shape == (2, 7)
    assert set(info["gt_names"]) == {"car", "pedestrian"}
    # box moved from global into lidar frame: lidar sits at ego z+1.8,
    # ego at x=s -> local x = global - s, z_bottom = 0.5 - 1.8 - 0.8
    s = NUM_SAMPLES - 1
    car = info["gt_boxes"][list(info["gt_names"]).index("car")]
    np.testing.assert_allclose(car[0], 2.0 + s - s, atol=1e-6)
    np.testing.assert_allclose(car[2], 0.5 - 1.8 - 0.8, atol=1e-6)
    np.testing.assert_allclose(car[3:6], [4.2, 1.8, 1.6], atol=1e-6)  # (dx, dy, dz)
    # constant 1 m/s x-velocity between samples 1s apart
    np.testing.assert_allclose(info["gt_velocity"][0], [1.0, 0.0], atol=1e-5)


def test_build_sample_train(infos_paths, data_cfg):
    ds = NuScenesDataset(data_cfg, infos_paths[0], train=True, use_cbgs=False)
    s = ds[1]
    d = data_cfg.data
    h, w = d.padded_img_shape
    assert s["points"].shape == (d.max_points, 5)
    assert s["images"].shape == (6, h, w, 3)
    assert s["gt_boxes"].shape == (d.max_gt_boxes, 9)
    assert s["gt_mask"].sum() == 2
    assert np.isfinite(s["points"]).all() and np.isfinite(s["images"]).all()
    # aug round-trip: lidar_aug_inv must take augmented points back to raw
    pm = s["points_mask"]
    pts_aug = s["points"][pm][:, :3]
    hom = np.concatenate([pts_aug, np.ones_like(pts_aug[:, :1])], -1)
    raw = (hom @ s["lidar_aug_inv"].T)[:, :3]
    back = (np.concatenate([raw, np.ones_like(raw[:, :1])], -1) @ s["lidar_aug"].T)[:, :3]
    np.testing.assert_allclose(back, pts_aug, atol=1e-4)


def test_build_sample_eval_projection(infos_paths, data_cfg):
    ds = NuScenesDataset(data_cfg, infos_paths[0], train=False)
    s = ds[0]
    # a point straight ahead of CAM_FRONT must project near image center
    # (camera 0 looks along +x of lidar frame in the synthetic rig)
    p = np.array([10.0, 0.0, -0.3 + 0.0, 1.0])  # lidar frame, z ~ cam height
    uvw = s["lidar2img"][0] @ p
    u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
    tw, th = data_cfg.data.img_scale
    assert 0 <= u <= tw and 0 <= v <= th
    assert s["lidar_aug"].tolist() == np.eye(4).tolist()
    assert s["token"] == "sample0"


def test_cbgs_balances(infos_paths, data_cfg):
    ds = NuScenesDataset(data_cfg, infos_paths[0], train=True, use_cbgs=True)
    # one resampled draw per class pool at this tiny scale
    assert len(ds) == 2
    assert all(0 <= i < NUM_SAMPLES for i in ds.indices)


def test_loader_batches(infos_paths, data_cfg):
    ds = NuScenesDataset(data_cfg, infos_paths[0], train=True, use_cbgs=False)
    dl = DataLoader(ds, batch_size=2, num_workers=0)
    batches = list(dl.epoch(0))
    assert len(batches) == 1  # 3 samples, drop_last
    b = batches[0]
    assert b["points"].shape[0] == 2
    assert b["gt_boxes"].shape == (2, data_cfg.data.max_gt_boxes, 9)

    ds_eval = NuScenesDataset(data_cfg, infos_paths[1], train=False)
    # val split is empty in the synthetic set; use train infos as eval
    ds_eval.infos = ds.infos
    ds_eval.indices = np.arange(len(ds.infos))
    dl_eval = DataLoader(ds_eval, batch_size=2, num_workers=0)
    batches = list(dl_eval.epoch(0, shuffle=False))
    assert len(batches) == 2
    assert batches[-1]["pad_count"] == 1


class _EpochProbeDataset:
    """Returns the epoch the *worker process* sees — regression probe for
    fork-pool staleness (workers snapshot the dataset; ADVICE r1 high)."""

    train = True
    epoch = 0

    def __len__(self):
        return 4

    def epoch_indices(self, epoch, shuffle):
        return np.arange(len(self))

    def __getitem__(self, i):
        return {"epoch": np.full((1,), self.epoch, np.int64)}


def test_loader_workers_see_current_epoch():
    dl = DataLoader(_EpochProbeDataset(), batch_size=2, num_workers=2)
    try:
        for expect in (0, 3):
            for b in dl.epoch(expect):
                assert (b["epoch"] == expect).all(), (
                    f"worker saw stale epoch {b['epoch'].ravel()}, want {expect}"
                )
    finally:
        dl.close()


def test_train_flip_fold_consistency(infos_paths, data_cfg):
    """When the horizontal flip fires, the image is mirrored AND lidar2img
    is updated so projections stay consistent (the reference leaves
    lidar2img stale — documented deviation in data/pipeline.py)."""
    import dataclasses as dc

    cfg = dc.replace(
        data_cfg,
        data=dc.replace(
            data_cfg.data, flip_ratio_horizontal=1.0, flip_ratio_vertical=0.0,
            rot_range=(0.0, 0.0), scale_ratio_range=(1.0, 1.0),
            translation_std=(0.0, 0.0, 0.0),
        ),
    )
    ds = NuScenesDataset(cfg, infos_paths[0], train=True, use_cbgs=False)
    s = ds[0]
    # flip matrix recorded: y negated
    assert s["lidar_aug"][1, 1] == -1.0
    # a raw-frame point projects through (lidar_aug_inv -> lidar2img) into
    # the flipped image: x' should be W - x of the unflipped projection
    ds_eval = NuScenesDataset(cfg, infos_paths[0], train=False)
    se = ds_eval[0]
    p_raw = np.array([10.0, 1.0, -0.3, 1.0])
    uv0 = se["lidar2img"][0] @ p_raw
    u0 = uv0[0] / uv0[2]
    # augmented-frame point = aug @ raw; model projects raw = aug_inv @ p_aug
    p_aug = s["lidar_aug"] @ p_raw
    raw_back = s["lidar_aug_inv"] @ p_aug
    uv1 = s["lidar2img"][0] @ raw_back
    u1 = uv1[0] / uv1[2]
    tw = cfg.data.img_scale[0]
    np.testing.assert_allclose(u1, tw - u0, atol=1e-3)
