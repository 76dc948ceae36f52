"""3D box utilities (LiDAR frame), pure JAX.

Box layout (matches the reference's LiDAR boxes as consumed by
TransFusionBBoxCoder, reference core/bbox/coders/transfusion_bbox_coder.py):

    [x, y, z_bottom, dx, dy, dz, yaw, (vx, vy)]

- (x, y, z_bottom): bottom-center of the box
- (dx, dy, dz): extents along the box frame x/y/z
- yaw: counter-clockwise rotation around +z, 0 along +x
- optional (vx, vy) velocity.

All functions are shape-polymorphic over leading batch dims and jittable.
"""

from __future__ import annotations

import jax.numpy as jnp


def gravity_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """Bottom-center box -> gravity (volumetric) center [..., 3].

    Mirrors mmdet3d's ``LiDARInstance3DBoxes.gravity_center`` used at
    reference deepinteraction_decoder.py:454.
    """
    return jnp.stack(
        [boxes[..., 0], boxes[..., 1], boxes[..., 2] + 0.5 * boxes[..., 5]], axis=-1
    )


def corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """8 corners of each box, [..., 8, 3].

    Corner order: all sign combinations of (±dx/2, ±dy/2) at z in {0, dz},
    rotated by yaw around +z then translated to the bottom center. Consumers
    in this codebase only take per-axis min/max (circumscribed rectangles,
    reference decoder_utils.py:730-738), so ordering is documented but not
    load-bearing.
    """
    x, y, z = boxes[..., 0], boxes[..., 1], boxes[..., 2]
    dx, dy, dz = boxes[..., 3], boxes[..., 4], boxes[..., 5]
    yaw = boxes[..., 6]
    # unit corners: (8, 3) with origin at bottom center
    ux = jnp.array([0.5, 0.5, 0.5, 0.5, -0.5, -0.5, -0.5, -0.5])
    uy = jnp.array([0.5, 0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5])
    uz = jnp.array([0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0])
    cx = dx[..., None] * ux
    cy = dy[..., None] * uy
    cz = dz[..., None] * uz
    c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    rx = c * cx - s * cy
    ry = s * cx + c * cy
    return jnp.stack(
        [rx + x[..., None], ry + y[..., None], cz + z[..., None]], axis=-1
    )


def bev_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """4 BEV corners [..., 4, 2] (ccw), from (x, y, dx, dy, yaw)."""
    x, y = boxes[..., 0], boxes[..., 1]
    dx, dy, yaw = boxes[..., 3], boxes[..., 4], boxes[..., 6]
    ux = jnp.array([0.5, -0.5, -0.5, 0.5])
    uy = jnp.array([0.5, 0.5, -0.5, -0.5])
    cx = dx[..., None] * ux
    cy = dy[..., None] * uy
    c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    return jnp.stack(
        [c * cx - s * cy + x[..., None], s * cx + c * cy + y[..., None]], axis=-1
    )
