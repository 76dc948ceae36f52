"""Photometric distortion + random resize transforms."""

import numpy as np

from deepinteraction_tpu.data.extra_transforms import (
    photometric_distortion,
    random_resize,
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
