"""Jittable greedy NMS (circle + rotated BEV), static shapes.

The reference runs circle-NMS in numpy on host and rotated NMS in CUDA
(deepinteraction_decoder.py:602-619); both are off by default in the shipped
configs (nms_type=None). Here both are sequential-greedy via lax.fori_loop
over score-sorted candidates with vectorized suppression tests, so they stay
inside the jitted graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotated_iou import iou_bev


def _greedy_keep(suppress: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Greedy selection. suppress[i, j] True if kept i suppresses j (i before j
    in score order); valid[j] pre-filter. Returns keep mask, all in the sorted
    order of the caller."""
    n = suppress.shape[0]

    def body(i, keep):
        # i is suppressed if any kept earlier box suppresses it
        sup = jnp.any(keep & suppress[:, i])
        return keep.at[i].set(valid[i] & ~sup)

    return jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))


def circle_nms(
    centers: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
) -> jnp.ndarray:
    """CenterPoint circle NMS.

    Reproduces the reference quirk (mmdet3d ``circle_nms``): the squared
    center distance is compared against the *unsquared* radius threshold.

    Args:
        centers: [N, 2]; scores: [N]; valid: [N] bool.
    Returns:
        [N] bool keep mask (in input order).
    """
    order = jnp.argsort(-scores)
    c = centers[order]
    v = valid[order]
    d2 = jnp.sum((c[:, None, :] - c[None, :, :]) ** 2, axis=-1)
    suppress = d2 <= radius
    keep_sorted = _greedy_keep(suppress, v)
    keep = jnp.zeros_like(keep_sorted)
    return keep.at[order].set(keep_sorted)


def rotated_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    pre_max_size: int | None = None,
) -> jnp.ndarray:
    """Rotated-BEV-IoU greedy NMS (mmdet3d ``nms_gpu`` equivalent).

    Args:
        boxes: [N, 7+] LiDAR boxes; scores: [N]; valid: [N] bool.
    Returns:
        [N] bool keep mask (in input order).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    if pre_max_size is not None and pre_max_size < n:
        pre_valid = jnp.arange(n) < pre_max_size
    else:
        pre_valid = jnp.ones((n,), bool)
    b = boxes[order]
    v = valid[order] & pre_valid
    iou = iou_bev(b, b)
    suppress = iou > iou_threshold
    keep_sorted = _greedy_keep(suppress, v)
    keep = jnp.zeros((n,), bool)
    return keep.at[order].set(keep_sorted)
