"""Optional image augmentations.

Rebuilds of the remaining reference PIPELINES
(datasets/pipelines/transform_3d.py):

- ``photometric_distortion``: PhotoMetricDistortionMultiViewImage (L144-241)
  — random brightness / contrast (two orderings) / saturation / hue /
  channel swap, same ranges and probability structure as mmdet.
- ``random_resize``: the Waymo-oriented MyResize (L243+) generalized —
  resize every view by a ratio drawn from ``ratio_range`` and fold the
  scale into lidar2img (the reference's Waymo path tracks scale_factor
  metadata instead; folding keeps the jitted graph aug-free).

Both operate on float32 RGB [V, H, W, 3] + [V, 4, 4] matrices, pre-padding.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def _rgb_to_hsv(img: np.ndarray) -> np.ndarray:
    import cv2

    return cv2.cvtColor(img.astype(np.float32), cv2.COLOR_RGB2HSV)


def _hsv_to_rgb(img: np.ndarray) -> np.ndarray:
    import cv2

    return cv2.cvtColor(img.astype(np.float32), cv2.COLOR_HSV2RGB)


def photometric_distortion(
    images: np.ndarray,  # [V, H, W, 3] float32, 0-255 RGB (pre-normalize)
    rng: np.random.Generator,
    brightness_delta: float = 32.0,
    contrast_range: Tuple[float, float] = (0.5, 1.5),
    saturation_range: Tuple[float, float] = (0.5, 1.5),
    hue_delta: float = 18.0,
) -> np.ndarray:
    """All views get the SAME draw (the reference distorts each view with
    one transform instance per sample)."""
    out = images.astype(np.float32).copy()

    if rng.integers(2):
        out += rng.uniform(-brightness_delta, brightness_delta)

    contrast_first = bool(rng.integers(2))
    alpha = rng.uniform(*contrast_range) if rng.integers(2) else None
    if contrast_first and alpha is not None:
        out *= alpha

    do_sat = bool(rng.integers(2))
    sat = rng.uniform(*saturation_range)
    do_hue = bool(rng.integers(2))
    hue = rng.uniform(-hue_delta, hue_delta)
    if do_sat or do_hue:
        for i in range(len(out)):
            hsv = _rgb_to_hsv(np.clip(out[i], 0, 255))
            if do_sat:
                hsv[..., 1] *= sat
            if do_hue:
                hsv[..., 0] = (hsv[..., 0] + hue) % 360.0
            out[i] = _hsv_to_rgb(hsv)

    if not contrast_first and alpha is not None:
        out *= alpha

    if rng.integers(2):
        perm = rng.permutation(3)
        out = out[..., perm]
    return np.clip(out, 0.0, 255.0)


def random_resize(
    images: Sequence[np.ndarray],  # V x [H, W, 3]
    lidar2img: np.ndarray,  # [V, 4, 4]
    rng: np.random.Generator,
    ratio_range: Tuple[float, float] = (0.9, 1.1),
):
    """Per-sample random scale; the scale matrix premultiplies lidar2img
    exactly like ScaleImageMultiViewImage (transform_3d.py:129-134)."""
    import cv2

    ratio = float(rng.uniform(*ratio_range))
    mats = lidar2img.copy()
    out = []
    for i, img in enumerate(images):
        h, w = img.shape[:2]
        nw, nh = int(w * ratio), int(h * ratio)
        out.append(cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR))
        scale = np.eye(4, dtype=np.float32)
        scale[0, 0] = nw / w
        scale[1, 1] = nh / h
        mats[i] = scale @ mats[i]
    return out, mats, ratio
