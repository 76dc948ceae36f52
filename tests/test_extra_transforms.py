"""Photometric distortion + resize transforms (incl. the Waymo My* family,
reference transform_3d.py:243-814)."""

import numpy as np

from deepinteraction_tpu.data.extra_transforms import (
    pad_waymo_view,
    photometric_distortion,
    random_resize,
    random_scale,
    rescale_keep_ratio,
    resize_multiview,
)


def test_photometric_distortion_bounds_and_shape():
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, size=(2, 16, 24, 3)).astype(np.float32)
    for seed in range(5):
        out = photometric_distortion(imgs, np.random.default_rng(seed))
        assert out.shape == imgs.shape
        assert out.min() >= 0.0 and out.max() <= 255.0
        assert np.isfinite(out).all()


def test_random_resize_folds_scale():
    rng = np.random.default_rng(1)
    imgs = [np.zeros((40, 60, 3), np.float32) for _ in range(2)]
    l2i = np.stack([np.eye(4, dtype=np.float32)] * 2)
    l2i[:, 0, 0] = 30.0  # fx
    out, mats, ratio = random_resize(imgs, l2i, rng, (0.5, 0.5))
    assert ratio == 0.5
    assert out[0].shape == (20, 30, 3)
    # projection of a point lands at half the pixel coords
    p = np.array([1.0, 0.0, 1.0, 1.0])
    before = (l2i[0] @ p)[:2] / (l2i[0] @ p)[2]
    after = (mats[0] @ p)[:2] / (mats[0] @ p)[2]
    np.testing.assert_allclose(after, before * 0.5, atol=1e-5)


def test_random_scale_modes():
    rng = np.random.default_rng(0)
    # single scale: identity pick, idx 0
    assert random_scale([(1280, 886)], rng) == ((1280, 886), 0)
    # ratio_range: base scale x uniform ratio in bounds
    for seed in range(10):
        s, idx = random_scale(
            [(1000, 600)], np.random.default_rng(seed), ratio_range=(0.5, 1.5)
        )
        assert idx is None
        assert 500 <= s[0] <= 1500 and 300 <= s[1] <= 900
        assert abs(s[0] / 1000 - s[1] / 600) < 0.01  # same ratio both edges
    # "range": long/short edges drawn between the two bounding scales
    for seed in range(10):
        s, idx = random_scale(
            [(640, 360), (1280, 720)], np.random.default_rng(seed), "range"
        )
        assert idx is None
        assert 640 <= s[0] <= 1280 and 360 <= s[1] <= 720
    # "value": uniform choice among listed scales, idx tracked
    choices = [(640, 360), (800, 450), (1280, 720)]
    seen = set()
    for seed in range(30):
        s, idx = random_scale(choices, np.random.default_rng(seed), "value")
        assert choices[idx] == s
        seen.add(idx)
    assert seen == {0, 1, 2}


def test_rescale_keep_ratio_fits_and_preserves_aspect():
    img = np.zeros((40, 100, 3), np.float32)  # wide image
    out, ws, hs = rescale_keep_ratio(img, (50, 30))
    # fits inside (long=50, short=30), aspect preserved
    assert out.shape[1] <= 50 and out.shape[0] <= 30
    assert abs(ws - hs) < 0.05  # minor rounding difference allowed (ref quirk)
    assert out.shape[1] == 50  # long edge binds: 100 -> 50


def test_resize_multiview_folds_scale_and_clips_boxes():
    imgs = [np.zeros((40, 60, 3), np.float32) for _ in range(2)]
    l2i = np.stack([np.eye(4, dtype=np.float32)] * 2)
    l2i[:, 0, 0] = 30.0
    boxes = np.array([[10.0, 10.0, 70.0, 35.0]], np.float32)  # overflows W
    out, mats, sf, nb = resize_multiview(
        imgs, l2i, (30, 20), keep_ratio=False, bboxes_2d=boxes
    )
    assert out[0].shape == (20, 30, 3)
    np.testing.assert_allclose(sf, [0.5, 0.5, 0.5, 0.5])
    # boxes scaled then x2 clipped to the resized border (35 -> 30)
    np.testing.assert_allclose(nb[0], [5.0, 5.0, 30.0, 17.5])
    # projection folded: pixel coords scale with the image
    p = np.array([1.0, 0.0, 1.0, 1.0])
    before = (l2i[0] @ p)[:2] / (l2i[0] @ p)[2]
    after = (mats[0] @ p)[:2] / (mats[0] @ p)[2]
    np.testing.assert_allclose(after, before * 0.5, atol=1e-5)


def test_pad_waymo_view():
    side = np.ones((886, 1920, 3), np.uint8)
    out = pad_waymo_view(side)
    assert out.shape == (1280, 1920, 3)
    assert out[:886].all() and not out[886:].any()
    front = np.ones((1280, 1920, 3), np.uint8)
    assert pad_waymo_view(front) is front
