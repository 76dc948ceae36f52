"""ROIAlignV2 (aligned, sampling_ratio=2) as vectorized XLA gathers.

TPU-native replacement for detectron2's CUDA ``ROIPooler``/ROIAlignV2 used by
the MMPI blocks (reference models/utils/decoder_utils.py:641-646,769-774):
7x7 crops with half-pixel alignment (aligned=True), 2x2 samples per bin,
average pooled, zero outside the map.

Border semantics match detectron2's ``bilinear_interpolate``: a sample at
y <= -1 or y >= H (same for x) contributes 0; otherwise coordinates are
clamped to the valid rectangle before the 4-tap lookup.

Everything is a dense gather over [N_rois, P, P, S, S] sample points — fully
vectorizable, no per-ROI loops (the reference loops Python-side per sample
and view).
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear(feat: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Detectron2-style bilinear lookup. feat [H, W, C]; x, y [...]."""
    h, w = feat.shape[0], feat.shape[1]
    inside = (y > -1.0) & (y < h) & (x > -1.0) & (x < w)
    y = jnp.clip(y, 0.0, h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    y1i, x1i = y1.astype(jnp.int32), x1.astype(jnp.int32)
    v00 = feat[y0i, x0i]
    v01 = feat[y0i, x1i]
    v10 = feat[y1i, x0i]
    v11 = feat[y1i, x1i]
    out = (
        v00 * (hy * hx)[..., None]
        + v01 * (hy * lx)[..., None]
        + v10 * (ly * hx)[..., None]
        + v11 * (ly * lx)[..., None]
    )
    return jnp.where(inside[..., None], out, 0.0)


def roi_align(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    *,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlignV2.

    Args:
        feat: [H, W, C] feature map.
        boxes: [N, 4] (x0, y0, x1, y1) in input-image coordinates
            (multiplied by ``spatial_scale`` internally, as detectron2 does).
    Returns:
        [N, output_size, output_size, C]
    """
    p = output_size
    s = sampling_ratio
    # aligned=True: half-pixel offset
    x0 = boxes[:, 0] * spatial_scale - 0.5
    y0 = boxes[:, 1] * spatial_scale - 0.5
    x1 = boxes[:, 2] * spatial_scale - 0.5
    y1 = boxes[:, 3] * spatial_scale - 0.5
    roi_w = x1 - x0
    roi_h = y1 - y0
    bin_w = roi_w / p
    bin_h = roi_h / p

    # sample offsets within a bin: (i + 0.5) / s for i in [0, s)
    off = (jnp.arange(s, dtype=feat.dtype) + 0.5) / s  # [s]
    bins = jnp.arange(p, dtype=feat.dtype)  # [p]

    # x coords: [N, p, s]
    sx = x0[:, None, None] + (bins[None, :, None] + off[None, None, :]) * bin_w[:, None, None]
    sy = y0[:, None, None] + (bins[None, :, None] + off[None, None, :]) * bin_h[:, None, None]

    # full grid [N, p, s, p, s]
    xg = jnp.broadcast_to(sx[:, None, None, :, :], (boxes.shape[0], p, s, p, s))
    yg = jnp.broadcast_to(sy[:, :, :, None, None], (boxes.shape[0], p, s, p, s))
    samples = _bilinear(feat, xg, yg)  # [N, p, s, p, s, C]
    return jnp.mean(samples, axis=(2, 4))  # average over the s*s samples


def _bilinear_views(feats, vi, x, y):
    """_bilinear against a [V, H, W, C] stack, per-point view index vi.

    vi broadcasts against x/y; gathers address the flattened [V*H*W, C]
    table so each sample costs one row gather regardless of view."""
    v_, h, w, c = feats.shape
    flat = feats.reshape(v_ * h * w, c)
    inside = (y > -1.0) & (y < h) & (x > -1.0) & (x < w)
    y = jnp.clip(y, 0.0, h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx
    base = jnp.broadcast_to(vi * (h * w), x.shape)
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    y1i, x1i = y1.astype(jnp.int32), x1.astype(jnp.int32)
    v00 = flat[base + y0i * w + x0i]
    v01 = flat[base + y0i * w + x1i]
    v10 = flat[base + y1i * w + x0i]
    v11 = flat[base + y1i * w + x1i]
    out = (
        v00 * (hy * hx)[..., None]
        + v01 * (hy * lx)[..., None]
        + v10 * (ly * hx)[..., None]
        + v11 * (ly * lx)[..., None]
    )
    return jnp.where(inside[..., None], out, 0.0)


def roi_align_views(
    feats: jnp.ndarray,
    boxes: jnp.ndarray,
    view_idx: jnp.ndarray,
    *,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlignV2 where each box crops from its own view of a [V, H, W, C]
    stack — the single-selected-view MMPI path (see models/decoder.py:
    only the last on-image view's refinement survives in the reference,
    decoder_utils.py:726-758, so sampling the other V-1 views is waste).

    Args:
        feats: [V, H, W, C]; boxes: [N, 4]; view_idx: [N] int32.
    Returns:
        [N, output_size, output_size, C]
    """
    p = output_size
    s = sampling_ratio
    x0 = boxes[:, 0] * spatial_scale - 0.5
    y0 = boxes[:, 1] * spatial_scale - 0.5
    x1 = boxes[:, 2] * spatial_scale - 0.5
    y1 = boxes[:, 3] * spatial_scale - 0.5
    bin_w = (x1 - x0) / p
    bin_h = (y1 - y0) / p
    off = (jnp.arange(s, dtype=feats.dtype) + 0.5) / s
    bins = jnp.arange(p, dtype=feats.dtype)
    sx = x0[:, None, None] + (bins[None, :, None] + off[None, None, :]) * bin_w[:, None, None]
    sy = y0[:, None, None] + (bins[None, :, None] + off[None, None, :]) * bin_h[:, None, None]
    n = boxes.shape[0]
    xg = jnp.broadcast_to(sx[:, None, None, :, :], (n, p, s, p, s))
    yg = jnp.broadcast_to(sy[:, :, :, None, None], (n, p, s, p, s))
    vi = view_idx.astype(jnp.int32)[:, None, None, None, None]
    samples = _bilinear_views(feats, vi, xg, yg)
    return jnp.mean(samples, axis=(2, 4))
