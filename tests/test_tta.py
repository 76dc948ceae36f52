"""TTA flip round-trips and weighted box fusion."""

import numpy as np

from deepinteraction_tpu.eval.tta import (
    FLIPS,
    flip_batch,
    merge_detections,
    unflip_boxes,
)


def _boxes(rows):
    b = np.zeros((len(rows), 9), np.float32)
    for i, (x, y, yaw) in enumerate(rows):
        b[i, :2] = (x, y)
        b[i, 3:6] = (4, 2, 1.5)
        b[i, 6] = yaw
        b[i, 7:9] = (1.0, -0.5)
    return b


def test_flip_roundtrip_boxes():
    base = _boxes([(5, 3, 0.3), (-2, 7, -1.2)])
    for fx, fy in FLIPS:
        flipped = unflip_boxes(base, fx, fy)  # same involution both ways
        back = unflip_boxes(flipped, fx, fy)
        np.testing.assert_allclose(back[:, :6], base[:, :6], atol=1e-6)
        np.testing.assert_allclose(back[:, 7:9], base[:, 7:9], atol=1e-6)
        np.testing.assert_allclose(
            np.stack([np.sin(back[:, 6]), np.cos(back[:, 6])]),
            np.stack([np.sin(base[:, 6]), np.cos(base[:, 6])]),
            atol=1e-5,
        )


def test_flip_batch_consistency():
    """Flipped points + folded aug matrix must keep raw-frame geometry:
    aug_inv(flip(p)) == original aug_inv(p)."""
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1, 50, 5)).astype(np.float32)
    aug = np.eye(4, dtype=np.float32)[None]
    batch = {"points": pts, "lidar_aug": aug, "lidar_aug_inv": aug.copy()}
    for fx, fy in FLIPS[1:]:
        fb = flip_batch(batch, fx, fy)
        hom = np.concatenate(
            [fb["points"][0, :, :3], np.ones((50, 1), np.float32)], -1
        )
        raw = (hom @ fb["lidar_aug_inv"][0].T)[:, :3]
        np.testing.assert_allclose(raw, pts[0, :, :3], atol=1e-5)


def test_merge_detections_clusters():
    b1 = _boxes([(5, 3, 0.30)])
    b2 = _boxes([(5.1, 3.05, 0.35)])  # same object, other TTA variant
    b3 = _boxes([(20, -4, 1.0)])  # only seen by variant 2
    merged_b, merged_s, merged_l = merge_detections(
        [b1, np.concatenate([b2, b3])],
        [np.array([0.8]), np.array([0.6, 0.9])],
        [np.array([0]), np.array([0, 2])],
        radius=0.5,
    )
    assert merged_b.shape[0] == 2
    # clustered pair averaged between the two centers
    i = int(np.argmin(np.abs(merged_b[:, 0] - 5.0)))
    assert 5.0 < merged_b[i, 0] < 5.1
    # full-agreement cluster keeps its max score; single-source is halved
    np.testing.assert_allclose(sorted(merged_s), [0.45, 0.8])
    assert set(merged_l.tolist()) == {0, 2}
