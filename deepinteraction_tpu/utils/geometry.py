"""Geometry primitives: homogeneous transforms, camera projection, bilinear
sampling with torch ``F.grid_sample`` semantics.

The reference inverts train-time point-cloud augmentations mid-forward via
mmdet3d's ``apply_3d_transformation`` (a flow of R/S/T/flip steps recorded in
img_metas; see reference encoder_utils.py:156,280). Here the host pipeline
folds the whole augmentation into ONE 4x4 matrix per sample
(``lidar_aug_matrix``: aug_points = M @ raw_points), so un-augmenting on
device is a single matmul with ``inverse(M)`` — equivalent affine math,
no flow interpreter.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

# Combine form for the flat [R, 4C] patch-gather output (the post-gather
# weighted cell sum). "slice" = 4 strided lane-slice multiply-adds.
# "matmul" = mask-matmul form: broadcast the [R, 4] cell weights to 4C
# lanes via a constant [4, 4C] selector, one fused elementwise multiply,
# then fold cells with a constant [4C, C] matmul on the MXU — no strided
# lane slices, same sum up to fp reassociation. The round-5 ++ trace put
# the slice form at ~71 ms/frame across its two call sites (deform_attn
# joint combine + this per-level combine) vs a ~4 ms traffic floor.
MSDA_COMBINE = os.environ.get("DI_MSDA_COMBINE", "slice")


def combine_flat_cells(g: jnp.ndarray, wf: jnp.ndarray, c: int) -> jnp.ndarray:
    """``out[..., r, :] = sum_i wf[..., r, i] * g[..., r, i*c:(i+1)*c]``
    computed without leaving the flat lane layout (see MSDA_COMBINE)."""
    if MSDA_COMBINE == "matmul":
        sel = jnp.repeat(jnp.eye(4, dtype=g.dtype), c, axis=1)  # [4, 4c]
        fold = jnp.tile(jnp.eye(c, dtype=g.dtype), (4, 1))  # [4c, c]
        return (g * (wf.astype(g.dtype) @ sel)) @ fold
    return sum(
        wf[..., i : i + 1] * g[..., i * c : (i + 1) * c] for i in range(4)
    )


# Backward form for the big row gathers (the MSDA patch-table sampling).
# XLA's autodiff transpose of gather is a scatter-ADD with non-unique
# indices, which the TPU serializes on per-update read-modify-write
# latency: ~181 ns/update vs the ~11 ns/index forward gather — measured
# 869 ms per [4.3M -> 1.07M, 64] instance, 4 instances = 48% of the
# full-size ++ train step (PERF.md round 5, tools/repro/scatter_bwd_bench).
#   segsort (default): sort -> segmented suffix-combine (log2 R shift-add
#     passes) -> one scatter whose indices are unique except at a trash
#     row (losers); EXACT totals up to f32 reassociation. 546 ms at the
#     shape above (1.6x the stock transpose).
#   cumsum: sort -> row cumsum -> per-segment difference -> the same
#     masked scatter; ~444 ms but carries the cumsum's cancellation error
#     (measured 7e-5 relative at model shapes).
#   scatter: the stock XLA transpose.
# NB: never claim indices_are_sorted on the masked index vector — the
# trash insertions make it unsorted and the TPU MISCOMPILES on the lie
# (wave-3/4 of the microbench: rel-1.0 garbage). unique_indices with
# duplicates only at the trash row measured correct.
GATHER_BWD = os.environ.get("DI_GATHER_BWD", "segsort")


@jax.custom_vjp
def take_rows(table: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """``table[ix]`` ([T, C] x [R] int32 -> [R, C]) with a sort-based
    backward (see GATHER_BWD). Forward is the plain XLA gather."""
    return jnp.take(table, ix, axis=0)


def _take_rows_fwd(table, ix):
    return jnp.take(table, ix, axis=0), (ix, table.shape[0])


def _take_rows_bwd(res, ct):
    ix, t = res
    if GATHER_BWD == "scatter" or ix.shape[0] < GATHER_BWD_MIN_ROWS:
        return jnp.zeros((t, ct.shape[-1]), ct.dtype).at[ix].add(ct), None
    r = ix.shape[0]
    order = jnp.argsort(ix)
    six = jnp.take(ix, order)
    sct = jnp.take(ct, order, axis=0)
    is_first = jnp.concatenate([jnp.ones((1,), bool), six[1:] != six[:-1]])
    if GATHER_BWD == "cumsum":
        cum = jnp.cumsum(sct, axis=0)
        ar = jnp.arange(r, dtype=jnp.int32)
        start = jax.lax.cummax(jnp.where(is_first, ar, -1))
        exc = jnp.where(
            (start > 0)[:, None], jnp.take(cum, start - 1, axis=0), 0.0
        )
        # at each segment's LAST row, cum - exc is the segment total; mask
        # every other row to the trash slot
        is_last = jnp.concatenate([six[1:] != six[:-1], jnp.ones((1,), bool)])
        acc = cum - exc
        live = is_last
    else:  # segsort: exact suffix-combine, total lands on the FIRST row
        acc = sct
        d = 1
        while d < r:
            same = jnp.concatenate([six[d:] == six[:-d], jnp.zeros((d,), bool)])
            shifted = jnp.concatenate(
                [acc[d:], jnp.zeros((d,) + acc.shape[1:], acc.dtype)]
            )
            acc = acc + jnp.where(same[:, None], shifted, 0.0)
            d *= 2
        live = is_first
    ixu = jnp.where(live, six, t)  # losers go to a trash row
    dtable = jnp.zeros((t + 1, ct.shape[-1]), ct.dtype).at[ixu].add(
        acc, unique_indices=True
    )[:t]
    return dtable, None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


# Chunk count for the fused sample+combine+psum backward below. The
# backward is run under lax.scan in K chunks so its per-chunk temps
# ([Rc, 4C] cotangents, sort payloads, doubling buffers) never approach
# the full-R footprint — a plain take_rows custom-VJP boundary at MSDA
# shapes materialized five 2.05 GB lane-padded combine-backward temps and
# OOM'd the full-size ++ train step (18.2 G > 15.75 G, PERF.md round 5).
GATHER_BWD_CHUNKS = int(os.environ.get("DI_GATHER_BWD_CHUNKS", "8"))
# Below this update-row count the stock scatter transpose wins: the sort +
# doubling overhead is ~200 ms at 4.3M rows but the scatter's per-update
# latency only dominates at scale (fusion_base's small decoder-side MSDA
# measured 1256 -> 1302 ms when segsort was applied unconditionally).
GATHER_BWD_MIN_ROWS = int(os.environ.get("DI_GATHER_BWD_MIN_ROWS", str(1 << 21)))


def _segsum_to_table(dtable, base, d_g, total_rows=None):
    """Accumulate d_g rows into dtable ([T+1, 4C], trash row last) by
    segment: sort -> segmented combine -> masked unique scatter (see
    GATHER_BWD notes above; 'segsort' = exact suffix doubling, 'cumsum' =
    one cumsum + per-segment difference, ~7e-5 rel cancellation error).
    'scatter' mode — or a small gather (``total_rows`` <
    GATHER_BWD_MIN_ROWS) — uses the stock transpose."""
    if GATHER_BWD == "scatter" or (
        total_rows or base.shape[0]
    ) < GATHER_BWD_MIN_ROWS:
        return dtable.at[base].add(d_g)
    r = base.shape[0]
    order = jnp.argsort(base)
    six = jnp.take(base, order)
    acc = jnp.take(d_g, order, axis=0)
    is_first = jnp.concatenate([jnp.ones((1,), bool), six[1:] != six[:-1]])
    if GATHER_BWD == "cumsum":
        cum = jnp.cumsum(acc, axis=0)
        ar = jnp.arange(r, dtype=jnp.int32)
        start = jax.lax.cummax(jnp.where(is_first, ar, -1))
        exc = jnp.where(
            (start > 0)[:, None], jnp.take(cum, start - 1, axis=0), 0.0
        )
        acc = cum - exc  # at each segment's LAST row: the segment total
        live = jnp.concatenate([six[1:] != six[:-1], jnp.ones((1,), bool)])
    else:  # segsort: exact suffix-combine, total lands on the FIRST row
        d = 1
        while d < r:
            same = jnp.concatenate([six[d:] == six[:-d], jnp.zeros((d,), bool)])
            shifted = jnp.concatenate(
                [acc[d:], jnp.zeros((d,) + acc.shape[1:], acc.dtype)]
            )
            acc = acc + jnp.where(same[:, None], shifted, 0.0)
            d *= 2
        live = is_first
    ixu = jnp.where(live, six, dtable.shape[0] - 1)
    return dtable.at[ixu].add(acc, unique_indices=True)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flat_cells_psum(table, base, wf, p):
    """Fused patch-flat gather + cell combine + sum over groups of ``p``
    consecutive rows: [T, 4C] x [R] x [R, 4] -> [R/p, C]."""
    c = table.shape[-1] // 4
    g = jnp.take(table, base, axis=0)
    acc = combine_flat_cells(g, wf, c)
    return jnp.sum(acc.reshape(-1, p, c), axis=1)


def _flat_cells_psum_fwd(table, base, wf, p):
    return _flat_cells_psum(table, base, wf, p), (table, base, wf)


def _flat_cells_psum_bwd(p, res, d):
    table, base, wf = res
    t, c4 = table.shape
    c = c4 // 4
    r = base.shape[0]
    k = GATHER_BWD_CHUNKS if r >= (1 << 19) else 1
    rq = r // p  # output rows
    rqc = -(-rq // k)  # output rows per chunk
    padq = k * rqc - rq

    def padto(x, n):
        return jnp.pad(x, [(0, n)] + [(0, 0)] * (x.ndim - 1))

    base_s = padto(base, padq * p).reshape(k, rqc * p)
    wf_s = padto(wf, padq * p).reshape(k, rqc * p, 4)
    d_s = padto(d, padq).reshape(k, rqc, c)
    # constant selectors: replicate [*, C] to 4C lanes / fold 4C -> 4
    tile = jnp.tile(jnp.eye(c, dtype=d.dtype), (1, 4))  # [C, 4C]
    fold = jnp.kron(jnp.eye(4, dtype=d.dtype), jnp.ones((c, 1), d.dtype))  # [4C, 4]
    sel = jnp.repeat(jnp.eye(4, dtype=d.dtype), c, axis=1)  # [4, 4C]

    def chunk(dtable, xs):
        base_c, wf_c, d_c = xs
        g_c = jnp.take(table, base_c, axis=0)  # [Rc, 4C]
        d4 = jnp.repeat(d_c, p, axis=0) @ tile  # [Rc, 4C] replicated
        d_g = d4 * (wf_c @ sel)
        d_wf = (g_c * d4) @ fold  # [Rc, 4]
        # threshold on the FULL row count (chunks are r/K by construction)
        return _segsum_to_table(dtable, base_c, d_g, total_rows=r), d_wf

    dtable, d_wf = jax.lax.scan(
        chunk, jnp.zeros((t + 1, c4), d.dtype), (base_s, wf_s, d_s)
    )
    return dtable[:t], None, d_wf.reshape(-1, 4)[:r]


_flat_cells_psum.defvjp(_flat_cells_psum_fwd, _flat_cells_psum_bwd)


def grid_sample_2d_views_patch_flat_psum(
    table: jnp.ndarray,
    vhw: tuple,
    grid_xy: jnp.ndarray,
    view_idx: jnp.ndarray,
    point_weights: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """:func:`grid_sample_2d_views_patch_flat` with the trailing (point)
    lead axis SUMMED inside a fused custom-VJP op — the MSDA exact-path
    sampler. Identical math to sample-then-sum; the hand-written chunked
    backward keeps temps ~R/K-sized and feeds the sort-based gather
    transpose (GATHER_BWD) instead of XLA's serialized scatter-add."""
    c = table.shape[-1] // 4
    base, (w00, w01, w10, w11) = _patch_cells(vhw, grid_xy, view_idx, align_corners)
    lead = base.shape  # (..., p)
    p = lead[-1]
    wf = jnp.stack([w.reshape(-1) for w in (w00, w01, w10, w11)], axis=-1)
    wf = wf * point_weights.reshape(-1, 1)
    out = _flat_cells_psum(table, base.reshape(-1), wf, p)
    return out.reshape(lead[:-1] + (c,))


def transform_points(mat: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a [4,4] homogeneous matrix to [..., 3] points."""
    return pts @ mat[:3, :3].T + mat[:3, 3]


def project_to_image(
    pts: jnp.ndarray,
    lidar2img: jnp.ndarray,
    eps: float = 1e-5,
):
    """Project LiDAR-frame points into a camera image plane.

    Matches the reference's projection arithmetic (encoder_utils.py:283-296):
    depth clamped at ``eps`` before divide, validity = depth > eps.

    Args:
        pts: [..., 3] points (already un-augmented to the raw LiDAR frame).
        lidar2img: [4, 4] projection matrix.
    Returns:
        xy: [..., 2] pixel coordinates, depth: [...], valid: [...] bool.
    """
    hom = pts @ lidar2img[:3, :3].T + lidar2img[:3, 3]
    depth = hom[..., 2]
    valid = depth > eps
    xy = hom[..., :2] / jnp.maximum(depth[..., None], eps)
    return xy, depth, valid


def grid_sample_2d(
    feat: jnp.ndarray,
    grid_xy: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear sample with zero padding; torch ``F.grid_sample`` semantics.

    Args:
        feat: [H, W, C] feature map.
        grid_xy: [..., 2] normalized coords in [-1, 1], (x, y) order where x
            indexes W.
    Returns:
        [..., C] sampled features (zeros outside the map).
    """
    h, w = feat.shape[0], feat.shape[1]
    x, y = grid_xy[..., 0], grid_xy[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (w - 1)
        fy = (y + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((x + 1.0) * w - 1.0) * 0.5
        fy = ((y + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    def tap(ix, iy):
        inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        v = feat[iyc, ixc]
        return jnp.where(inside[..., None], v, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    wx0, wx1 = (1.0 - tx)[..., None], tx[..., None]
    wy0, wy1 = (1.0 - ty)[..., None], ty[..., None]
    return (v00 * wx0 + v01 * wx1) * wy0 + (v10 * wx0 + v11 * wx1) * wy1


def grid_sample_2d_patch(
    feat: jnp.ndarray,
    grid_xy: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear sample, same semantics as :func:`grid_sample_2d`, but all
    four taps arrive in ONE sliced gather ([N] x dynamic_slice(2, 2, C))
    instead of four row gathers.

    MEASURED NEGATIVE on v5e (0.61 vs 1.09 fps e2e): XLA lowers the vmapped
    sliced gather worse than four plain row gathers. Kept (oracle-tested)
    as documentation of the experiment and for future compiler revisits —
    do not wire into the model without re-measuring.

    Args:
        feat: [H, W, C]; grid_xy: [N, 2] normalized coords.
    Returns:
        [N, C].
    """
    h, w = feat.shape[0], feat.shape[1]
    x, y = grid_xy[..., 0], grid_xy[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (w - 1)
        fy = (y + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((x + 1.0) * w - 1.0) * 0.5
        fy = ((y + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]

    xi = jnp.clip(x0, -1, w - 1).astype(jnp.int32)
    yi = jnp.clip(y0, -1, h - 1).astype(jnp.int32)
    # per-tap validity (zero-padding semantics of torch grid_sample)
    vx0 = ((x0 >= 0) & (x0 < w))[..., None]
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 < w))[..., None]
    vy0 = ((y0 >= 0) & (y0 < h))[..., None]
    vy1 = ((y0 + 1 >= 0) & (y0 + 1 < h))[..., None]

    # NB: jax dynamic_slice wraps NEGATIVE starts numpy-style, so clamp
    # before slicing; the offset below recovers the shifted window
    xs = jnp.clip(xi, 0, w - 2)
    ys = jnp.clip(yi, 0, h - 2)
    patch = jax.vmap(
        lambda yy, xx: jax.lax.dynamic_slice(
            feat, (yy, xx, 0), (2, 2, feat.shape[2])
        )
    )(ys, xs)  # [N, 2, 2, C]
    # which patch cell corresponds to (x0, y0) after the clamp shift
    ox = (xi - xs).astype(jnp.int32)  # -1, 0, or 1
    oy = (yi - ys).astype(jnp.int32)
    def cell(dy, dx):
        iy = jnp.clip(oy + dy, 0, 1)
        ix = jnp.clip(ox + dx, 0, 1)
        return jnp.take_along_axis(
            jnp.take_along_axis(patch, iy[:, None, None, None], axis=1),
            ix[:, None, None, None],
            axis=2,
        )[:, 0, 0]

    v00 = cell(0, 0) * (vx0 & vy0)
    v01 = cell(0, 1) * (vx1 & vy0)
    v10 = cell(1, 0) * (vx0 & vy1)
    v11 = cell(1, 1) * (vx1 & vy1)
    wx0, wx1 = 1.0 - tx, tx
    wy0, wy1 = 1.0 - ty, ty
    return (v00 * wx0 + v01 * wx1) * wy0 + (v10 * wx0 + v11 * wx1) * wy1


def grid_sample_2d_views(
    feats: jnp.ndarray,
    grid_xy: jnp.ndarray,
    view_idx: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear sample where each element picks its own view.

    Same torch ``F.grid_sample`` zero-padding semantics as
    :func:`grid_sample_2d`, but the feature stack [V, H, W, C] is addressed
    per element through ``view_idx`` by folding the view into the row index
    of a [V*H, W, C] table. Used by the I2P top-2-view compaction: sampling
    only the (at most two) cameras a pillar actually projects into cuts the
    gather volume 3x vs sampling all six views (PERF.md lever #4).

    Args:
        feats: [V, H, W, C].
        grid_xy: [..., 2] normalized (x, y) in [-1, 1], per element.
        view_idx: [...] int32 view selector, same shape as grid_xy[..., 0].
    Returns:
        [..., C] sampled features (zeros outside the selected map).
    """
    v, h, w = feats.shape[0], feats.shape[1], feats.shape[2]
    flat = feats.reshape(v * h, w, feats.shape[3])
    x, y = grid_xy[..., 0], grid_xy[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (w - 1)
        fy = (y + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((x + 1.0) * w - 1.0) * 0.5
        fy = ((y + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    base = view_idx.astype(jnp.int32) * h

    def tap(ix, iy):
        inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = base + jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        val = flat[iyc, ixc]
        return jnp.where(inside[..., None], val, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    wx0, wx1 = (1.0 - tx)[..., None], tx[..., None]
    wy0, wy1 = (1.0 - ty)[..., None], ty[..., None]
    return (v00 * wx0 + v01 * wx1) * wy0 + (v10 * wx0 + v11 * wx1) * wy1


def grid_sample_2d_nearest(
    feat: jnp.ndarray,
    grid_xy: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Nearest-neighbor sample, torch ``F.grid_sample(mode='nearest')``
    semantics (zero padding).

    ONE row gather per sample point instead of bilinear's four — TPU
    gathers are index-rate-bound at ~10 ns/index (PERF.md), so this is a
    ~4x cut on sampling cost wherever the quality gate allows it
    (eval-time I2P, DI_I2P_SAMPLE=nearest).
    """
    h, w = feat.shape[0], feat.shape[1]
    x, y = grid_xy[..., 0], grid_xy[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (w - 1)
        fy = (y + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((x + 1.0) * w - 1.0) * 0.5
        fy = ((y + 1.0) * h - 1.0) * 0.5
    ix = jnp.floor(fx + 0.5)
    iy = jnp.floor(fy + 0.5)
    inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
    iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
    return jnp.where(inside[..., None], feat[iyc, ixc], 0.0)


def nearest_row_ids(
    vhw: tuple,
    grid_xy: jnp.ndarray,
    view_idx: jnp.ndarray,
    align_corners: bool = False,
):
    """Flat row ids of the nearest pixel per sample point: ([...] int32
    into a [V*H*W] row table, [...] bool inside-mask). Shares the rounding
    of :func:`grid_sample_2d_views_nearest` so callers can dedupe ids
    before gathering (the I2P key-dedupe lever, PERF.md round 5)."""
    v, h, w = vhw
    x, y = grid_xy[..., 0], grid_xy[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (w - 1)
        fy = (y + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((x + 1.0) * w - 1.0) * 0.5
        fy = ((y + 1.0) * h - 1.0) * 0.5
    ix = jnp.floor(fx + 0.5)
    iy = jnp.floor(fy + 0.5)
    inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
    iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
    return (view_idx.astype(jnp.int32) * h + iyc) * w + ixc, inside


def grid_sample_2d_views_nearest(
    feats: jnp.ndarray,
    grid_xy: jnp.ndarray,
    view_idx: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Nearest-neighbor counterpart of :func:`grid_sample_2d_views`:
    per-element view selection through a [V*H, W, C] row table, one gather
    per sample point."""
    v, h, w = feats.shape[0], feats.shape[1], feats.shape[2]
    flat = feats.reshape(v * h, w, feats.shape[3])
    x, y = grid_xy[..., 0], grid_xy[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (w - 1)
        fy = (y + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((x + 1.0) * w - 1.0) * 0.5
        fy = ((y + 1.0) * h - 1.0) * 0.5
    ix = jnp.floor(fx + 0.5)
    iy = jnp.floor(fy + 0.5)
    inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
    iyc = view_idx.astype(jnp.int32) * h + jnp.clip(iy, 0, h - 1).astype(
        jnp.int32
    )
    return jnp.where(inside[..., None], flat[iyc, ixc], 0.0)


def build_patch_table(feats: jnp.ndarray) -> jnp.ndarray:
    """[V, H, W, C] -> [V*H*W, 4, C] table of 2x2 bilinear patches.

    TPU gathers read whole (8, 128)-element tiles: a plain row gather of a
    C=128 feature row moves 4 KB of HBM for 512 B of payload, so 4-tap
    bilinear sampling costs 16 KB per sample point. Entry i of this table
    holds rows (i, i+1, i+W, i+W+1) — the full 2x2 patch — in the SUBLANE
    dimension, so one [4, C] row IS one tile and the whole patch arrives in
    a single 4 KB read: 4x less gather traffic. Build cost is three rolled
    copies of the feature map (bandwidth-bound, ~1 ms at I2P sizes).
    """
    v, h, w, c = feats.shape
    flat = feats.reshape(v * h * w, c)
    return jnp.stack(
        [
            flat,
            jnp.roll(flat, -1, 0),
            jnp.roll(flat, -w, 0),
            jnp.roll(flat, -(w + 1), 0),
        ],
        axis=1,
    )


def build_patch_table_flat(feats: jnp.ndarray) -> jnp.ndarray:
    """[V, H, W, C] -> [V*H*W, 4*C] patch table (cells side-by-side in the
    LANE dimension). For C <= 32 this is the layout that gathers fastest:
    the whole row is a sub-tile lane run, measured 3.7x faster than per-tap
    gathers at MSDA shapes (C=16). For C = 128 prefer
    :func:`build_patch_table` ([N, 4, C], sublane-packed)."""
    v, h, w, c = feats.shape
    fl = feats.reshape(v * h * w, c)
    return jnp.concatenate(
        [fl, jnp.roll(fl, -1, 0), jnp.roll(fl, -w, 0), jnp.roll(fl, -(w + 1), 0)],
        axis=1,
    )


def _patch_cells(vhw, grid_xy, view_idx, align_corners):
    """Shared 2x2-patch addressing: anchor row index + per-cell bilinear
    weights with zero-padding semantics folded in.

    Bilinear weights are separable (w_tap = wx * wy, validity vx & vy), and
    the edge clamp maps each axis's taps onto patch cells independently, so
    the tap->cell routing folds into per-axis CELL weights — pure scalar
    arithmetic. (A take_along_axis per tap lowers to 4 extra element-rate
    gathers and measured 2x slower than the 4 plain row gathers it was
    meant to replace.)
      ox == -1 (anchor clamped up):  cell x0 <- tap x1, cell x1 <- 0
      ox ==  0 (interior):           cell x0 <- tap x0, cell x1 <- tap x1
      ox == +1 (anchor clamped dn):  cell x0 <- 0,      cell x1 <- tap x0
    """
    v, h, w = vhw
    x, y = grid_xy[..., 0], grid_xy[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (w - 1)
        fy = (y + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((x + 1.0) * w - 1.0) * 0.5
        fy = ((y + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    xs = jnp.clip(x0, 0, w - 2).astype(jnp.int32)
    ys = jnp.clip(y0, 0, h - 2).astype(jnp.int32)
    ox = jnp.clip(x0, -1, w - 1).astype(jnp.int32) - xs
    oy = jnp.clip(y0, -1, h - 1).astype(jnp.int32) - ys
    base = (view_idx.astype(jnp.int32) * h + ys) * w + xs
    vx0 = ((x0 >= 0) & (x0 < w)).astype(tx.dtype)
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 < w)).astype(tx.dtype)
    vy0 = ((y0 >= 0) & (y0 < h)).astype(ty.dtype)
    vy1 = ((y0 + 1 >= 0) & (y0 + 1 < h)).astype(ty.dtype)
    wxa, wxb = (1.0 - tx) * vx0, tx * vx1  # tap x0 / tap x1 weights
    wya, wyb = (1.0 - ty) * vy0, ty * vy1
    cwx0 = jnp.where(ox == 0, wxa, jnp.where(ox == -1, wxb, 0.0))
    cwx1 = jnp.where(ox == 0, wxb, jnp.where(ox == 1, wxa, 0.0))
    cwy0 = jnp.where(oy == 0, wya, jnp.where(oy == -1, wyb, 0.0))
    cwy1 = jnp.where(oy == 0, wyb, jnp.where(oy == 1, wya, 0.0))
    return base, (cwy0 * cwx0, cwy0 * cwx1, cwy1 * cwx0, cwy1 * cwx1)


def grid_sample_2d_views_patch(
    table: jnp.ndarray,
    vhw: tuple,
    grid_xy: jnp.ndarray,
    view_idx: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """:func:`grid_sample_2d_views` against a :func:`build_patch_table`
    table — identical math and zero-padding semantics, one gather per
    sample point instead of four.

    Args:
        table: [V*H*W, 4, C] patch table.
        vhw: the (V, H, W) of the original feature stack (static).
        grid_xy: [..., 2] normalized (x, y) in [-1, 1].
        view_idx: [...] int32 view selector.
    Returns:
        [..., C] sampled features.
    """
    base, (w00, w01, w10, w11) = _patch_cells(vhw, grid_xy, view_idx, align_corners)
    g = table[base]  # [..., 4, C] = (y,x) (y,x+1) (y+1,x) (y+1,x+1)
    return (
        w00[..., None] * g[..., 0, :]
        + w01[..., None] * g[..., 1, :]
        + w10[..., None] * g[..., 2, :]
        + w11[..., None] * g[..., 3, :]
    )


def grid_sample_2d_views_patch_flat(
    table: jnp.ndarray,
    vhw: tuple,
    grid_xy: jnp.ndarray,
    view_idx: jnp.ndarray,
    align_corners: bool = False,
    point_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """:func:`grid_sample_2d_views_patch` against the FLAT
    ([V*H*W, 4*C], :func:`build_patch_table_flat`) layout — the fast
    variant for narrow channels (MSDA heads, C<=32).

    The tap combine runs on the FLAT [R, 4C] gather output (lane slices at
    C-aligned offsets) and only then reshapes back: splitting the row dim
    is layout-free, while combining in the multi-dim [.., p, 4, C] shape
    makes XLA pick a sublane-padded tile (T(2,128)/T(4,128)) and relayout
    the whole gather output first — measured 35 + 50 ms of pure data
    formatting per ++ frame before this restructure (PERF.md round 4).

    ``point_weights`` ([...] matching ``grid_xy``'s leading dims, e.g. MSDA
    attention weights) are folded into the 4 cell weights BEFORE the
    combine — per-row scalar arithmetic on the [R, 4] weight matrix — so
    the caller's weighted point-sum needs no separate broadcast-multiply
    over the lane-padded [.., p, C] output."""
    c = table.shape[-1] // 4
    base, (w00, w01, w10, w11) = _patch_cells(vhw, grid_xy, view_idx, align_corners)
    lead = base.shape
    # take_rows: plain gather forward, sort-based backward (GATHER_BWD) —
    # the stock scatter-add transpose of THIS gather was 48% of the ++
    # train step (PERF.md round 5)
    g = take_rows(table, base.reshape(-1))  # [R, 4*C], R = prod(lead)
    wf = jnp.stack(
        [w.reshape(-1) for w in (w00, w01, w10, w11)], axis=-1
    )  # [R, 4]
    if point_weights is not None:
        wf = wf * point_weights.reshape(-1, 1)
    out = combine_flat_cells(g, wf, c)  # [R, C]
    return out.reshape(lead + (c,))


def make_rotation_z(angle) -> jnp.ndarray:
    """[4,4] ccw rotation around +z."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero, zero], -1),
            jnp.stack([s, c, zero, zero], -1),
            jnp.stack([zero, zero, one, zero], -1),
            jnp.stack([zero, zero, zero, one], -1),
        ],
        -2,
    )


def compose_aug_matrix(
    rotation: float = 0.0,
    scale: float = 1.0,
    translation=(0.0, 0.0, 0.0),
    flip_x: bool = False,
    flip_y: bool = False,
):
    """Build the single 4x4 LiDAR augmentation matrix used by the host pipeline.

    Order matches the reference train pipeline (GlobalRotScaleTrans applies
    rotation, then scaling, then translation — mmdet3d semantics — and
    RandomFlip3D flips afterwards; config Fusion_0075_refactor.py:38-47):
        p' = F · (s · R · p + t)
    ``flip_x`` mirrors across the x-axis (y := -y, mmdet3d
    'horizontal' BEV flip); ``flip_y`` mirrors x := -x ('vertical').
    """
    import numpy as np

    c, s = np.cos(rotation), np.sin(rotation)
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = scale * np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    m[:3, 3] = np.asarray(translation, dtype=np.float64)
    f = np.eye(4, dtype=np.float64)
    if flip_x:
        f[1, 1] = -1.0
    if flip_y:
        f[0, 0] = -1.0
    return (f @ m).astype(np.float32)
