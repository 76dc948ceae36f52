"""CenterNet-style gaussian heatmap targets, vectorized.

Replaces mmdet3d's ``gaussian_radius`` + per-box ``draw_heatmap_gaussian``
loop (reference deepinteraction_decoder.py:460-475) with a single masked
max-reduction over all GT boxes — no Python loop, static [G] box capacity.
"""

from __future__ import annotations

import jax.numpy as jnp


def gaussian_radius(det_size, min_overlap: float):
    """CenterNet radius formula; det_size = (length, width) in feature cells.

    Mirrors mmdet3d ``gaussian_radius`` (called at reference
    deepinteraction_decoder.py:466).
    """
    height, width = det_size
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_heatmap(
    centers_xy: jnp.ndarray,
    radii: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    num_classes: int,
    height: int,
    width: int,
) -> jnp.ndarray:
    """Render per-class gaussian heatmaps.

    Matches CenterNet ``draw_umich_gaussian`` semantics: integer center,
    sigma = (2r+1)/6, values outside the (2r+1)² patch are 0, per-pixel max
    across boxes.

    Args:
        centers_xy: [G, 2] float feature-grid coords (x, y).
        radii: [G] int radii (already max'd with min_radius).
        labels: [G] int class ids.
        mask: [G] bool valid-box mask.
    Returns:
        [num_classes, height, width] float32 heatmap.
    """
    cx = jnp.floor(centers_xy[:, 0]).astype(jnp.int32)  # torch .to(int32) truncates;
    cy = jnp.floor(centers_xy[:, 1]).astype(jnp.int32)  # centers are in-range => equal
    sigma = (2.0 * radii.astype(jnp.float32) + 1.0) / 6.0
    xs = jnp.arange(width, dtype=jnp.int32)
    ys = jnp.arange(height, dtype=jnp.int32)
    dx = xs[None, None, :] - cx[:, None, None]  # [G, 1, W]
    dy = ys[None, :, None] - cy[:, None, None]  # [G, H, 1]
    d2 = dx.astype(jnp.float32) ** 2 + dy.astype(jnp.float32) ** 2  # [G, H, W]
    g = jnp.exp(-d2 / (2.0 * sigma[:, None, None] ** 2))
    inpatch = (jnp.abs(dx) <= radii[:, None, None]) & (
        jnp.abs(dy) <= radii[:, None, None]
    )
    g = jnp.where(inpatch & mask[:, None, None], g, 0.0)  # [G, H, W]
    # scatter-max each box's patch into its class plane (no [C,G,H,W] blowup)
    heatmap = jnp.zeros((num_classes, height, width), jnp.float32)
    lbl = jnp.where(mask, labels, num_classes)  # invalid boxes -> dropped row
    return heatmap.at[lbl].max(g, mode="drop")
