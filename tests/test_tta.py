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


def test_tta_inference_batched():
    """Variants fuse per example, never across examples (B=2)."""
    from types import SimpleNamespace

    from deepinteraction_tpu.eval.tta import tta_inference

    truth0 = _boxes([(5, 3, 0.3)])
    truth1 = _boxes([(-2, 7, -1.2), (1, 1, 0.5)])

    def pad(b, n):
        out = np.zeros((n, b.shape[1]), np.float32)
        out[: len(b)] = b
        return out

    def forward(_, batch):
        # detect the variant from the fused aug matrix; emit the truth in
        # the FLIPPED frame so unflip_boxes maps it back (involution)
        aug = np.asarray(batch["lidar_aug"])[0]
        fx, fy = bool(aug[1, 1] < 0), bool(aug[0, 0] < 0)
        from deepinteraction_tpu.eval.tta import unflip_boxes

        boxes = np.stack(
            [pad(unflip_boxes(truth0, fx, fy), 2), pad(unflip_boxes(truth1, fx, fy), 2)]
        )
        return SimpleNamespace(
            boxes=boxes,
            scores=np.array([[0.9, 0.0], [0.8, 0.7]], np.float32),
            labels=np.zeros((2, 2), np.int64),
            keep=np.array([[True, False], [True, True]]),
        )

    batch = {
        "points": np.zeros((2, 4, 5), np.float32),
        "lidar_aug": np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
    }
    res = tta_inference(forward, None, batch)
    assert len(res) == 2
    b0, s0, l0 = res[0]
    assert b0.shape[0] == 1 and l0.tolist() == [0]
    np.testing.assert_allclose(b0[0, :2], truth0[0, :2], atol=1e-5)
    np.testing.assert_allclose(b0[0, 6], truth0[0, 6], atol=1e-5)
    b1, s1, _ = res[1]
    assert b1.shape[0] == 2  # example 1's two boxes never merge into ex 0
    got = sorted(np.round(b1[:, :2], 3).tolist())
    want = sorted(np.round(truth1[:, :2], 3).tolist())
    np.testing.assert_allclose(got, want, atol=1e-5)
