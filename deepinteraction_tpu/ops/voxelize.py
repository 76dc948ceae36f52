"""Hard voxelization as sort/segment XLA ops (TPU-native spconv replacement).

The reference voxelizes every sample twice per step with spconv's CUDA
``PointToVoxel`` (reference models/updated_modules/sparse_voxelize.py:23-30,
called from models/detectors/deepinteraction.py:151-171): bucket points into
at most ``max_voxels`` voxels keeping at most ``max_num_points`` points each,
in first-come order.

TPU redesign: one stable sort by linear voxel id turns the problem into
segment arithmetic with fully static shapes —

    sort points by voxel id  ->  segment starts  ->  rank within segment
    ->  scatter to [max_voxels, max_pts, D]

Point order inside a voxel is preserved exactly (stable sort). Deterministic
deviation from spconv, documented: when more than ``max_voxels`` voxels
exist, we keep the voxels with the smallest linear id rather than
first-occurrence order (order-invariant for every consumer in this model;
only the overflow-drop set differs, and only in over-dense scenes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VoxelizedOutput(NamedTuple):
    """Static-shape voxelization result.

    voxels: [max_voxels, max_pts, D] point features (zero padded)
    num_points: [max_voxels] int32 valid points per voxel (0 for pad voxels)
    coords: [max_voxels, 3] int32 (iz, iy, ix), -1 for pad voxels
    num_voxels: [] int32 number of real voxels
    point_voxel_idx: [N] int32 destination voxel slot of each input point
        (-1 if dropped), useful for tests and scatter-backs.
    """

    voxels: jnp.ndarray
    num_points: jnp.ndarray
    coords: jnp.ndarray
    num_voxels: jnp.ndarray
    point_voxel_idx: jnp.ndarray


def _bin_points(points, points_mask, voxel_size, point_cloud_range):
    """Per-point voxel indices + validity + linear id (sentinel = n_cells)."""
    vx, vy, vz = voxel_size
    x0, y0, z0, x1, y1, z1 = point_cloud_range
    nx = int(round((x1 - x0) / vx))
    ny = int(round((y1 - y0) / vy))
    nz = int(round((z1 - z0) / vz))

    ix = jnp.floor((points[:, 0] - x0) / vx).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - y0) / vy).astype(jnp.int32)
    iz = jnp.floor((points[:, 2] - z0) / vz).astype(jnp.int32)
    in_range = (
        (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny) & (iz >= 0) & (iz < nz)
    )
    valid = in_range & points_mask
    lin = jnp.where(valid, (iz * ny + iy) * nx + ix, nx * ny * nz)
    return lin, valid, jnp.stack([iz, iy, ix], axis=-1), nx * ny * nz


def voxelize(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    *,
    voxel_size,
    point_cloud_range,
    max_num_points: int,
    max_voxels: int,
    order: jnp.ndarray | None = None,
) -> VoxelizedOutput:
    """Hard-voxelize a padded point cloud.

    Args:
        points: [N, D] (x, y, z, ...) — N is a static pad size.
        points_mask: [N] bool validity of each row.
        order: optional precomputed stable argsort of the linear ids (see
            :func:`voxelize_batched` — a batched [B, N] sort lowers ~4x
            slower than one flat sort on TPU).
    """
    n = points.shape[0]
    d = points.shape[1]

    if order is None:
        lin, _, _, _ = _bin_points(
            points, points_mask, voxel_size, point_cloud_range
        )
        order = jnp.argsort(lin, stable=True)  # ties keep point order

    # ONE packed row gather of [points | mask] in sorted order. TPU gathers
    # are index-rate-bound (~7-9 ns/index regardless of row width, PERF.md),
    # so the previous four same-index gathers (lin_s, valid_s, pts_s, izyx)
    # cost 4x this single one; the per-point bins are recomputed on the
    # sorted rows instead — bit-identical, floor() of the same floats.
    packed = jnp.concatenate(
        [points, points_mask[:, None].astype(points.dtype)], axis=1
    )
    packed_s = packed[order]  # [N, D+1]
    pts_s = packed_s[:, :d]
    mask_s = packed_s[:, d] > 0.5
    lin_s, valid_s, izyx_s, _ = _bin_points(
        pts_s, mask_s, voxel_size, point_cloud_range
    )

    # segment starts among the sorted ids
    first = jnp.concatenate(
        [jnp.array([True]), lin_s[1:] != lin_s[:-1]]
    ) & valid_s
    # rank of each point's voxel among unique valid voxels (id order)
    voxel_rank = jnp.cumsum(first.astype(jnp.int32)) - 1  # [-1 .. num_voxels)
    voxel_rank = jnp.where(valid_s, voxel_rank, -1)
    num_voxels = jnp.where(valid_s.any(), jnp.max(voxel_rank) + 1, 0)

    # position of each point within its voxel: index - index_of_segment_start
    idx = jnp.arange(n, dtype=jnp.int32)
    seg_start_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, idx, -1)
    )
    pos = idx - seg_start_idx

    keep = valid_s & (pos < max_num_points) & (voxel_rank < max_voxels)

    # Gather-formulated output build (TPU: scatters and gathers are
    # index-rate-bound at ~10 ns/index regardless of row width, so the
    # old [K*P]-index scatter of single points is replaced by ONE
    # K-index scatter of segment starts + K ROW gathers of P-point
    # windows — ~P x fewer indices; measured ~2x on the voxelizer tail).
    #
    # starts[r] = sorted index of voxel rank r's first point; rank
    # max_voxels (the first overflow voxel) is stored too so the last
    # kept voxel's segment still ends at the right place on overflow
    rank_c = jnp.where(
        first & (voxel_rank <= max_voxels), voxel_rank, max_voxels + 1
    )
    starts_full = jnp.zeros((max_voxels + 2,), jnp.int32).at[rank_c].set(
        idx, mode="drop"
    )
    starts = starts_full[:max_voxels]
    # seg_len per voxel = next segment start - own start (valid ranks only)
    total_valid = jnp.sum(valid_s.astype(jnp.int32))
    nxt = starts_full[1 : max_voxels + 1]
    vslot = jnp.arange(max_voxels, dtype=jnp.int32)
    slot_ok = vslot < jnp.minimum(num_voxels, max_voxels)
    nxt = jnp.where(vslot + 1 < num_voxels, nxt, total_valid)
    counts = jnp.where(
        slot_ok, jnp.minimum(nxt - starts, max_num_points), 0
    ).astype(jnp.int32)

    # P-point window table: win[i] = pts_s[i : i + P] flattened to one
    # [P*D]-wide row so each voxel costs ONE single-tile row gather
    # (a [N, P, D] layout spans 2 tiles/row and measured 6x slower)
    win = jnp.concatenate(
        [
            jnp.pad(pts_s[p:], ((0, p), (0, 0)))
            for p in range(max_num_points)
        ],
        axis=1,
    )  # [N, P*D]
    voxels = win[jnp.where(slot_ok, starts, 0)].reshape(
        max_voxels, max_num_points, d
    )
    pmask = jnp.arange(max_num_points, dtype=jnp.int32)[None, :] < counts[:, None]
    voxels = jnp.where(pmask[..., None], voxels, 0.0)

    coords = izyx_s[jnp.where(slot_ok, starts, 0)]
    coords = jnp.where(slot_ok[:, None], coords, -1)

    # map back: destination slot per ORIGINAL point index (consumed only
    # by tests; dead-code-eliminated from the model's jitted graph)
    point_voxel = jnp.full((n,), -1, jnp.int32)
    point_voxel = point_voxel.at[order].set(jnp.where(keep, voxel_rank, -1))

    return VoxelizedOutput(
        voxels=voxels,
        num_points=counts,
        coords=coords,
        num_voxels=jnp.minimum(num_voxels, max_voxels).astype(jnp.int32),
        point_voxel_idx=point_voxel,
    )


def voxelize_batched(
    points: jnp.ndarray,  # [B, N, D]
    points_mask: jnp.ndarray,  # [B, N]
    *,
    voxel_size,
    point_cloud_range,
    max_num_points: int,
    max_voxels: int,
) -> VoxelizedOutput:
    """vmap(voxelize); at b == 1 the per-sample stable argsort is replaced
    by ONE flat stable sort over row-offset keys (a batched [B, N] sort
    lowers ~4x slower than a flat 1-D sort on TPU; same trick as
    sparse_conv.downsample_sites_batched). Bit-identical to the vmapped
    form: within a row, flat order == row order, so stability carries.

    At b > 1 the sorts stay PER SAMPLE: a flat sort across the batch is a
    cross-batch op, so on a data-sharded mesh XLA must all-gather the
    whole batch onto every device and replicate the sort — a net loss for
    DP training/serving that also breaks the collective-free-serving
    property (tests/test_dp_serving.py). The batched lowering's 4x sort
    penalty is ~10 ms/step, the all-gather is unbounded with mesh size."""
    b, n = points.shape[0], points.shape[1]

    def one(p, m, o):
        return voxelize(
            p,
            m,
            voxel_size=voxel_size,
            point_cloud_range=point_cloud_range,
            max_num_points=max_num_points,
            max_voxels=max_voxels,
            order=o,
        )

    if b > 1:
        return jax.vmap(lambda p, m: one(p, m, None))(points, points_mask)

    # n_cells is static; the array outputs of this probe call are unused
    # and dead-code-eliminated
    n_cells = _bin_points(points[0], points_mask[0], voxel_size, point_cloud_range)[3]
    lin = jax.vmap(
        lambda p, m: _bin_points(p, m, voxel_size, point_cloud_range)[0]
    )(points, points_mask)
    assert b * (n_cells + 1) < 2**31, "flat-sort row offsets overflow int32"
    offs = (jnp.arange(b, dtype=jnp.int32) * (n_cells + 1))[:, None]
    flat_order = jnp.argsort((lin + offs).reshape(-1), stable=True)
    order = flat_order.reshape(b, n) - (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    return jax.vmap(one)(points, points_mask, order)


def hard_simple_vfe(voxels: jnp.ndarray, num_points: jnp.ndarray) -> jnp.ndarray:
    """Mean of the valid points in each voxel.

    Reference: mmdet3d ``HardSimpleVFE`` (config Fusion_0075_refactor.py:156-159).

    Args:
        voxels: [V, P, D]; num_points: [V].
    Returns:
        [V, D] per-voxel mean features (zeros for empty voxels).
    """
    p = voxels.shape[1]
    mask = (
        jnp.arange(p, dtype=jnp.int32)[None, :] < num_points[:, None]
    ).astype(voxels.dtype)
    s = jnp.sum(voxels * mask[..., None], axis=1)
    return s / jnp.maximum(num_points[:, None].astype(voxels.dtype), 1.0)
