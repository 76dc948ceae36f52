"""On-device multi-scale depth completion (ip_basic) in pure JAX.

The reference calls OpenCV's ``fill_in_multiscale`` on CPU for every camera
view *inside the forward pass* (reference models/utils/encoder_utils.py:178-182
-> models/utils/ip_basic/depth_map_utils.py:134-268) — a device→host→device
round-trip per view per sample. This module re-derives every stage as XLA
window ops so depth completion stays on-chip:

- grayscale dilation  = max-pool with a structuring-element mask (-inf pad,
  matching cv2's dilate border convention)
- erosion             = min-pool (+inf pad)
- close               = dilate then erode
- 5x5 median blur     = sort of the 25-tap window (replicate pad, like cv2)
- bilateral filter    = explicit 5x5 window with OpenCV's gaussian space /
  range weights (reflect-101 pad)

Stage order, bin thresholds, masks and the two reference quirks (the stale
``valid_pixels`` reused for the bilateral write-back, depth_map_utils.py:249,260;
argmax-on-empty-column giving top_row 0) are reproduced exactly.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Structuring elements (reference depth_map_utils.py:8-64)
FULL_5 = np.ones((5, 5), np.float32)
FULL_7 = np.ones((7, 7), np.float32)
FULL_9 = np.ones((9, 9), np.float32)


def _cross(n):
    k = np.zeros((n, n), np.float32)
    k[n // 2, :] = 1
    k[:, n // 2] = 1
    return k


CROSS_3 = _cross(3)
CROSS_5 = _cross(5)
CROSS_7 = _cross(7)


def _window_reduce(img, kernel_mask, op, pad_value):
    """Apply max/min over the nonzero offsets of a structuring element.

    img: [..., H, W]. Static unroll over kernel taps (<= 81) — XLA fuses into
    a handful of vector ops.
    """
    kh, kw = kernel_mask.shape
    rh, rw = kh // 2, kw // 2
    h, w = img.shape[-2], img.shape[-1]
    pad_cfg = [(0, 0)] * (img.ndim - 2) + [(rh, rh), (rw, rw)]
    p = jnp.pad(img, pad_cfg, constant_values=pad_value)
    out = None
    for dy in range(kh):
        for dx in range(kw):
            if kernel_mask[dy, dx] == 0:
                continue
            sl = p[..., dy : dy + h, dx : dx + w]
            out = sl if out is None else op(out, sl)
    return out


def dilate(img, kernel):
    return _window_reduce(img, kernel, jnp.maximum, -jnp.inf)


def erode(img, kernel):
    return _window_reduce(img, kernel, jnp.minimum, jnp.inf)


def morph_close(img, kernel):
    return erode(dilate(img, kernel), kernel)


def median5(img):
    """5x5 median with replicate border (cv2.medianBlur convention)."""
    h, w = img.shape[-2], img.shape[-1]
    pad_cfg = [(0, 0)] * (img.ndim - 2) + [(2, 2), (2, 2)]
    p = jnp.pad(img, pad_cfg, mode="edge")
    taps = [
        p[..., dy : dy + h, dx : dx + w] for dy in range(5) for dx in range(5)
    ]
    stack = jnp.stack(taps, axis=-1)
    return jnp.sort(stack, axis=-1)[..., 12]


def bilateral5(img, sigma_color=0.5, sigma_space=2.0):
    """OpenCV bilateralFilter(d=5) for single-channel float, reflect-101 pad."""
    h, w = img.shape[-2], img.shape[-1]
    pad_cfg = [(0, 0)] * (img.ndim - 2) + [(2, 2), (2, 2)]
    p = jnp.pad(img, pad_cfg, mode="reflect")
    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    cc = -0.5 / (sigma_color**2)
    sc = -0.5 / (sigma_space**2)
    for dy in range(5):
        for dx in range(5):
            r2 = (dy - 2) ** 2 + (dx - 2) ** 2
            if r2 > 4:  # OpenCV skips taps outside the radius-d/2 circle
                continue
            tap = p[..., dy : dy + h, dx : dx + w]
            wgt = jnp.exp(cc * (tap - img) ** 2) * np.exp(sc * r2)
            num = num + wgt * tap
            den = den + wgt
    return num / jnp.maximum(den, 1e-20)


def fill_in_multiscale(
    depth: jnp.ndarray, max_depth: float = 100.0, lite: bool = False
) -> jnp.ndarray:
    """Dense depth from sparse depth, [..., H, W] -> [..., H, W].

    Faithful port of reference depth_map_utils.fill_in_multiscale with
    extrapolate=False, blur_type='bilateral' (the call-site settings,
    encoder_utils.py:175-177).

    ``lite`` (DI_DEPTH_FILL_LITE at the BEVWarp call site, eval only;
    quality-gated deviation — see docs/DESIGN.md): 2 hole-extension
    dilations instead of 6 and no final median/bilateral smoothing. The
    filled depth only steers which image row BEVWarp samples per BEV cell,
    so smoothing precision matters far less than at the reference's
    original depth-completion use. Default off (exact reference semantics).
    """
    d_in = depth.astype(jnp.float32)
    near = (d_in > 0.1) & (d_in <= 15.0)
    med = (d_in > 15.0) & (d_in <= 30.0)
    far = d_in > 30.0

    valid = d_in > 0.1
    s1 = jnp.where(valid, max_depth - d_in, d_in)

    dil_far = dilate(s1 * far, CROSS_3)
    dil_med = dilate(s1 * med, CROSS_5)
    dil_near = dilate(s1 * near, CROSS_7)

    s2 = s1
    s2 = jnp.where(dil_far > 0.1, dil_far, s2)
    s2 = jnp.where(dil_med > 0.1, dil_med, s2)
    s2 = jnp.where(dil_near > 0.1, dil_near, s2)

    s3 = morph_close(s2, FULL_5)

    blur = median5(s3)
    s4 = jnp.where(s3 > 0.1, blur, s3)

    rows = jnp.arange(d_in.shape[-2])[:, None]  # [H, 1]
    top_row = jnp.argmax(s4 > 0.1, axis=-2)  # [..., W]; 0 if column empty
    top_mask = rows >= top_row[..., None, :]
    empty = (~(s4 > 0.1)) & top_mask
    s5 = jnp.where(empty, dilate(s4, FULL_9), s4)

    # extrapolate=False branch: recompute the top mask from s5
    top_row = jnp.argmax(s5 > 0.1, axis=-2)
    top_mask = rows >= top_row[..., None, :]
    s7 = s5
    for _ in range(2 if lite else 6):
        empty = (s7 < 0.1) & top_mask
        s7 = jnp.where(empty, dilate(s7, FULL_5), s7)

    if not lite:
        blur = median5(s7)
        valid = (s7 > 0.1) & top_mask
        s7 = jnp.where(valid, blur, s7)

        # reference quirk: bilateral write-back reuses the pre-median
        # valid mask
        blur = bilateral5(s7, 0.5, 2.0)
        s7 = jnp.where(valid, blur, s7)

    return jnp.where(s7 > 0.1, max_depth - s7, s7)
