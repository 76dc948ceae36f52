"""Rotated BEV / 3D IoU, fully on-device.

TPU-native replacement for mmdet3d's CUDA ``BboxOverlaps3D`` (used in the
Hungarian matching cost, reference core/bbox/assigners/hungarian_assigner.py:127)
and the rotated-NMS overlap kernel.

Intersection of two rotated rectangles is computed with the candidate-point
method instead of sequential Sutherland–Hodgman clipping: the intersection
polygon's vertices are a subset of {corners of A inside B} ∪ {corners of B
inside A} ∪ {edge-edge crossings} (≤ 8 of 24 candidates). Candidates are
masked, sorted by angle around their centroid, and measured with a masked
shoelace — no data-dependent control flow, so everything vmaps/jits cleanly
over pair matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.boxes import bev_corners


def _cross(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _point_in_quad(pts: jnp.ndarray, quad: jnp.ndarray) -> jnp.ndarray:
    """pts [..., 2] inside convex ccw quad [4, 2] (inclusive)."""
    eps = 1e-7
    inside = jnp.ones(pts.shape[:-1], bool)
    for i in range(4):
        a = quad[i]
        b = quad[(i + 1) % 4]
        inside &= _cross(a, b, pts) >= -eps
    return inside


def _seg_intersections(qa: jnp.ndarray, qb: jnp.ndarray):
    """All 16 edge-edge intersection points between two quads.

    Returns pts [16, 2], valid [16].
    """
    a0 = qa  # [4,2]
    a1 = jnp.roll(qa, -1, axis=0)
    b0 = qb
    b1 = jnp.roll(qb, -1, axis=0)
    # pairwise [4,4]
    a0p = a0[:, None, :]
    a1p = a1[:, None, :]
    b0p = b0[None, :, :]
    b1p = b1[None, :, :]
    d1 = a1p - a0p
    d2 = b1p - b0p
    denom = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]
    safe = jnp.where(jnp.abs(denom) < 1e-10, 1.0, denom)
    diff = b0p - a0p
    t = (diff[..., 0] * d2[..., 1] - diff[..., 1] * d2[..., 0]) / safe
    u = (diff[..., 0] * d1[..., 1] - diff[..., 1] * d1[..., 0]) / safe
    valid = (
        (jnp.abs(denom) >= 1e-10)
        & (t >= 0.0)
        & (t <= 1.0)
        & (u >= 0.0)
        & (u <= 1.0)
    )
    pts = a0p + t[..., None] * d1
    return pts.reshape(16, 2), valid.reshape(16)


def _pair_intersection_area(qa: jnp.ndarray, qb: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two ccw quads [4, 2] each. Scalar."""
    ca = _point_in_quad(qa, qb)  # [4]
    cb = _point_in_quad(qb, qa)  # [4]
    pe, ve = _seg_intersections(qa, qb)  # [16,2],[16]
    pts = jnp.concatenate([qa, qb, pe], axis=0)  # [24, 2]
    val = jnp.concatenate([ca, cb, ve], axis=0)  # [24]

    n_valid = jnp.sum(val)
    wsum = jnp.sum(jnp.where(val[:, None], pts, 0.0), axis=0)
    centroid = wsum / jnp.maximum(n_valid, 1.0)
    ang = jnp.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    ang = jnp.where(val, ang, jnp.inf)  # invalid sort last
    order = jnp.argsort(ang)
    p = pts[order]
    v = val[order]
    cnt = jnp.sum(v).astype(jnp.int32)
    idx = jnp.arange(24)
    nxt = jnp.where(idx + 1 < cnt, idx + 1, 0)
    p_next = p[nxt]
    contrib = p[:, 0] * p_next[:, 1] - p_next[:, 0] * p[:, 1]
    contrib = jnp.where(idx < cnt, contrib, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(contrib))
    return jnp.where(cnt >= 3, area, 0.0)


def bev_overlap(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated BEV intersection areas.

    Args:
        boxes_a: [N, 7+], boxes_b: [M, 7+] in box layout (utils.boxes).
    Returns:
        [N, M] intersection areas.
    """
    qa = bev_corners(boxes_a)  # [N,4,2] ccw
    qb = bev_corners(boxes_b)  # [M,4,2]
    f = jax.vmap(
        jax.vmap(_pair_intersection_area, in_axes=(None, 0)), in_axes=(0, None)
    )
    return f(qa, qb)


def iou_3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3D IoU for LiDAR boxes (z = bottom).

    Matches mmdet3d ``BboxOverlaps3D(coordinate='lidar')`` math: rotated BEV
    intersection × vertical overlap / volume union.
    """
    inter_bev = bev_overlap(boxes_a, boxes_b)  # [N, M]
    za0, za1 = boxes_a[:, 2], boxes_a[:, 2] + boxes_a[:, 5]
    zb0, zb1 = boxes_b[:, 2], boxes_b[:, 2] + boxes_b[:, 5]
    overlap_z = jnp.maximum(
        jnp.minimum(za1[:, None], zb1[None, :])
        - jnp.maximum(za0[:, None], zb0[None, :]),
        0.0,
    )
    inter = inter_bev * overlap_z
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    union = vol_a[:, None] + vol_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-8)


def iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated BEV IoU (for rotated NMS)."""
    inter = bev_overlap(boxes_a, boxes_b)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-8)
