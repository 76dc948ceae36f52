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
- ``random_scale`` / ``rescale_keep_ratio`` / ``resize_multiview``: the full
  MyResize semantics (transform_3d.py:313-590) — the three multiscale
  selection modes (ratio_range / "range" / "value"), mmcv ``imrescale``
  keep-ratio scaling, per-axis scale_factor, and 2D bbox resize + border
  clip. MyNormalize/MyPad (L593-697) are per-view loops over the same math
  as NormalizeMultiviewImage/PadMultiViewImage, already ported in
  data/pipeline.py; MyFlip3D (L698-814) is RandomFlip3D semantics, ported
  as ``pipeline.random_flip`` (with the documented sync_2d lidar2img fix).
- ``pad_waymo_view``: LoadMultiViewImageFromFilesWaymo.pad (L258-262) —
  zero-pad short (886-row) Waymo views to the common 1280-row height.

All operate on float32 RGB [V, H, W, 3] + [V, 4, 4] matrices, pre-padding.
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


def random_scale(
    img_scales: Sequence[Tuple[int, int]],
    rng: np.random.Generator,
    multiscale_mode: str = "range",
    ratio_range: Tuple[float, float] | None = None,
) -> Tuple[Tuple[int, int], int | None]:
    """MyResize._random_scale (transform_3d.py:448-478): pick a (long, short)
    target scale.

    - ``ratio_range`` set: one base scale times a uniform ratio draw;
    - mode "range": independent uniform integer draws of long and short
      edges between the two bounding scales;
    - mode "value": uniform choice among the listed scales.
    Returns (scale, scale_idx) — scale_idx is None except in "value" mode,
    matching the reference's bookkeeping.
    """
    if ratio_range is not None:
        assert len(img_scales) == 1
        lo, hi = ratio_range
        ratio = float(rng.random()) * (hi - lo) + lo
        base = img_scales[0]
        return (int(base[0] * ratio), int(base[1] * ratio)), None
    if len(img_scales) == 1:
        return tuple(img_scales[0]), 0
    if multiscale_mode == "range":
        assert len(img_scales) == 2
        longs = [max(s) for s in img_scales]
        shorts = [min(s) for s in img_scales]
        long_edge = int(rng.integers(min(longs), max(longs) + 1))
        short_edge = int(rng.integers(min(shorts), max(shorts) + 1))
        return (long_edge, short_edge), None
    if multiscale_mode == "value":
        idx = int(rng.integers(len(img_scales)))
        return tuple(img_scales[idx]), idx
    raise ValueError(f"unknown multiscale_mode {multiscale_mode!r}")


def rescale_keep_ratio(
    img: np.ndarray, scale: Tuple[int, int]
) -> Tuple[np.ndarray, float, float]:
    """mmcv ``imrescale`` semantics (MyResize keep_ratio=True branch,
    transform_3d.py:484-497): scale so the image fits inside
    (max(scale), min(scale)) preserving aspect; per-axis w/h factors are
    recomputed from the ROUNDED output size, reproducing the reference's
    'minor difference' between w_scale and h_scale."""
    import cv2

    h, w = img.shape[:2]
    factor = min(max(scale) / max(h, w), min(scale) / min(h, w))
    nw, nh = int(w * factor + 0.5), int(h * factor + 0.5)
    out = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    return out, nw / w, nh / h


def resize_multiview(
    images: Sequence[np.ndarray],  # V x [H, W, 3]
    lidar2img: np.ndarray,  # [V, 4, 4]
    scale: Tuple[int, int],
    keep_ratio: bool = True,
    bboxes_2d: np.ndarray | None = None,  # [N, 4] xyxy, optional
    bbox_clip_border: bool = True,
):
    """MyResize applied to every view (transform_3d.py:480-590):
    resize, produce the [w, h, w, h] ``scale_factor``, fold the scale into
    lidar2img (TPU design: metadata becomes matrices), and resize + clip 2D
    boxes like _resize_bboxes."""
    import cv2

    mats = lidar2img.copy()
    out = []
    w_scale = h_scale = 1.0
    for i, img in enumerate(images):
        if keep_ratio:
            rimg, w_scale, h_scale = rescale_keep_ratio(img, scale)
        else:
            h, w = img.shape[:2]
            rimg = cv2.resize(
                img, (scale[0], scale[1]), interpolation=cv2.INTER_LINEAR
            )
            w_scale, h_scale = scale[0] / w, scale[1] / h
        out.append(rimg)
        smat = np.eye(4, dtype=np.float32)
        smat[0, 0] = w_scale
        smat[1, 1] = h_scale
        mats[i] = smat @ mats[i]
    scale_factor = np.array([w_scale, h_scale, w_scale, h_scale], np.float32)
    new_boxes = None
    if bboxes_2d is not None:
        new_boxes = bboxes_2d * scale_factor
        if bbox_clip_border:
            nh, nw = out[0].shape[:2]
            new_boxes[:, 0::2] = np.clip(new_boxes[:, 0::2], 0, nw)
            new_boxes[:, 1::2] = np.clip(new_boxes[:, 1::2], 0, nh)
    return out, mats, scale_factor, new_boxes


def pad_waymo_view(img: np.ndarray, target_rows: int = 1280) -> np.ndarray:
    """LoadMultiViewImageFromFilesWaymo.pad (transform_3d.py:258-262):
    zero-pad a short (e.g. 886-row side-camera) view to the common height."""
    if img.shape[0] >= target_rows:
        return img
    pad = np.zeros(
        (target_rows - img.shape[0],) + img.shape[1:], dtype=img.dtype
    )
    return np.concatenate([img, pad], axis=0)


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
