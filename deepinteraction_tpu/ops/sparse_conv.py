"""Sparse 3D convolution over a static-capacity COO voxel list (spconv on TPU).

The reference's middle encoder is spconv's CUDA ``SparseEncoder``
(config Fusion_0075_refactor.py:160-168, consumed at
models/detectors/deepinteraction.py:127). TPU redesign:

- A sparse tensor is (features [K, C], coords [K, 3], valid [K]) with a
  STATIC capacity K; coords stay sorted by linear id at all times.
- Neighbor resolution = vectorized binary search (``searchsorted``) of
  offset-shifted linear ids against the sorted active set — no hash tables,
  no dynamic shapes, all dense int ops XLA handles well.
- Submanifold conv = one [K, 27, Cin] gather + a single [K, 27·Cin] x
  [27·Cin, Cout] matmul — one large MXU contraction per layer (and one
  scatter-add per layer in the backward) instead of 27 small ones.
- Strided (downsampling) conv generates candidate output sites (≤ 2 per
  input per axis), dedupes them with one sort, and convolves from the
  output's perspective.

Zero-padding row trick: gathers index a K+1-row table whose last row is 0,
so invalid neighbors contribute nothing without masking multiplies.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

# x-widened (m3) neighbor maps: 2.4x faster table builds for ~1 GB of
# transient HBM at stage-0 size (see dense_index_map3). Off switch for
# memory-tight (training) A/B runs.
_USE_M3 = os.environ.get("DI_NBR_M3", "1") == "1"


class SparseTensor(NamedTuple):
    features: jnp.ndarray  # [K, C]
    coords: jnp.ndarray  # [K, 3] int32 (z, y, x); arbitrary where ~valid
    valid: jnp.ndarray  # [K] bool
    shape: Tuple[int, int, int]  # (nz, ny, nx) static


def linear_ids(coords: jnp.ndarray, valid: jnp.ndarray, shape) -> jnp.ndarray:
    """Linear ids, invalid rows mapped to a sentinel that sorts last."""
    nz, ny, nx = shape
    lid = (coords[:, 0] * ny + coords[:, 1]) * nx + coords[:, 2]
    return jnp.where(valid, lid, jnp.iinfo(jnp.int32).max)


def from_voxelizer(features, coords, num_voxels, shape) -> SparseTensor:
    """Wrap voxelizer output (already sorted by linear id) as a SparseTensor."""
    k = features.shape[0]
    valid = jnp.arange(k, dtype=jnp.int32) < num_voxels
    return SparseTensor(features, coords, valid, tuple(shape))


def _kernel_offsets(kernel: Sequence[int]) -> list:
    kz, ky, kx = kernel
    return [
        (dz, dy, dx)
        for dz in range(kz)
        for dy in range(ky)
        for dx in range(kx)
    ]


def dense_index_map(st: SparseTensor) -> jnp.ndarray:
    """Flat [nz*ny*nx] int32 map: linear id -> row in the active set (K =
    empty). One scatter builds it; neighbor lookups become direct gathers.

    ~340 MB for the full 41x1440x1440 grid — a deliberate HBM-for-speed
    trade: the searchsorted alternative costs 27 binary searches (~17
    passes) per site per stage and measured ~10x slower end-to-end.
    """
    nz, ny, nx = st.shape
    k = st.coords.shape[0]
    ids = jnp.where(
        st.valid,
        (st.coords[:, 0] * ny + st.coords[:, 1]) * nx + st.coords[:, 2],
        nz * ny * nx,
    )
    dense = jnp.full((nz * ny * nx,), k, jnp.int32)
    return dense.at[ids].set(jnp.arange(k, dtype=jnp.int32), mode="drop")


def dense_index_map3(st: SparseTensor) -> jnp.ndarray:
    """x-widened dense map: m3[t] = (map[t-1], map[t], map[t+1]), [N, 3].

    Gathers on TPU are index-rate-bound (~10 ns per gathered element OR
    row, independent of row width up to a tile), so fetching the three
    x-taps of a (dz, dy) group as ONE 3-wide row gather instead of three
    element gathers cuts neighbor-table cost ~2.4x (measured on v5e at
    stage-0 size: 27 element gathers 51 ms -> m3 build 9 ms + 9 row
    gathers 12 ms). Costs 3x the dense map in HBM transiently (~1 GB at
    the full 41x1440x1440 grid).
    """
    dmap = dense_index_map(st)
    k = st.coords.shape[0]
    mm = jnp.pad(dmap, (1, 1), constant_values=k)
    return jnp.stack([mm[:-2], mm[1:-1], mm[2:]], axis=1)


# grids with at most this many cells widen the dense map to 9-wide
# (y,x)-neighborhood rows: one gather per dz instead of nine element
# gathers; the 9x map build (36 B/cell) is cheap below this size
_M9_CELL_LIMIT = int(os.environ.get("DI_NBR_M9_LIMIT", str(12_000_000)))


def dense_index_map9(st: SparseTensor) -> jnp.ndarray:
    """(y,x)-widened dense map: m9[t] = map[t + dy*nx + dx] for
    (dy, dx) ∈ {-1,0,1}² (row-major), [N, 9]. See dense_index_map3 for
    the gather-cost rationale; used for the downsampled stages where the
    9x map fits comfortably (_M9_CELL_LIMIT)."""
    _, ny, nx = st.shape
    dmap = dense_index_map(st)
    k = st.coords.shape[0]
    pad = nx + 1
    mm = jnp.pad(dmap, (pad, pad), constant_values=k)
    n = dmap.shape[0]
    cols = [
        mm[pad + dy * nx + dx : pad + dy * nx + dx + n]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ]
    return jnp.stack(cols, axis=1)


def subm_neighbor_table(
    st: SparseTensor, kernel=(3, 3, 3), dense_map: jnp.ndarray | None = None
) -> jnp.ndarray:
    """[K, prod(kernel)] gather indices into the active set (K = miss).

    Tap d of output site i reads input site at coords[i] + d - kernel//2,
    matching spconv SubMConv3d (same active set in and out). For 3x3x3
    kernels the taps are fetched 3-at-a-time from the x-widened map
    (``dense_index_map3``) — or 9-at-a-time from the (y,x)-widened map on
    small grids; other kernels use per-tap element gathers.
    """
    nz, ny, nx = st.shape
    k = st.coords.shape[0]
    n = nz * ny * nx
    if tuple(kernel) == (3, 3, 3) and dense_map is None and _USE_M3:
        if n <= _M9_CELL_LIMIT:
            m9 = dense_index_map9(st)
            tables = []
            for dz in (-1, 0, 1):
                tz = st.coords[:, 0] + dz
                base = (tz * ny + st.coords[:, 1]) * nx + st.coords[:, 2]
                rows = m9[jnp.clip(base, 0, n - 1)]  # [K, 9]
                zok = (tz >= 0) & (tz < nz) & st.valid
                for i, (dy, dx) in enumerate(
                    [(a, b) for a in (-1, 0, 1) for b in (-1, 0, 1)]
                ):
                    ty = st.coords[:, 1] + dy
                    tx = st.coords[:, 2] + dx
                    inb = zok & (ty >= 0) & (ty < ny) & (tx >= 0) & (tx < nx)
                    tables.append(jnp.where(inb, rows[:, i], k))
            return jnp.stack(tables, axis=1).astype(jnp.int32)
        m3 = dense_index_map3(st)
        tables = []
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tz = st.coords[:, 0] + dz
                ty = st.coords[:, 1] + dy
                base = (tz * ny + ty) * nx + st.coords[:, 2]
                rows = m3[jnp.clip(base, 0, n - 1)]  # [K, 3] = dx -1,0,1
                zyok = (tz >= 0) & (tz < nz) & (ty >= 0) & (ty < ny) & st.valid
                for i, dx in enumerate((-1, 0, 1)):
                    tx = st.coords[:, 2] + dx
                    inb = zyok & (tx >= 0) & (tx < nx)
                    tables.append(jnp.where(inb, rows[:, i], k))
        return jnp.stack(tables, axis=1).astype(jnp.int32)
    if dense_map is None:
        dense_map = dense_index_map(st)
    offs = _kernel_offsets(kernel)
    rz, ry, rx = kernel[0] // 2, kernel[1] // 2, kernel[2] // 2
    tables = []
    for dz, dy, dx in offs:
        tz = st.coords[:, 0] + (dz - rz)
        ty = st.coords[:, 1] + (dy - ry)
        tx = st.coords[:, 2] + (dx - rx)
        inb = (
            (tz >= 0) & (tz < nz) & (ty >= 0) & (ty < ny) & (tx >= 0) & (tx < nx)
        ) & st.valid
        tid = (tz * ny + ty) * nx + tx
        pos = dense_map[jnp.clip(tid, 0, nz * ny * nx - 1)]
        tables.append(jnp.where(inb, pos, k))
    return jnp.stack(tables, axis=1).astype(jnp.int32)


def gathered_matmul(
    features: jnp.ndarray,
    nbr: jnp.ndarray,
    weights: jnp.ndarray,
    valid_out: jnp.ndarray,
) -> jnp.ndarray:
    """out[i] = Σ_d feat[nbr[i, d]] @ W[d], with a zero row for misses.

    features: [K, Cin]; nbr: [Ko, D]; weights: [D, Cin, Cout].
    """
    kin = features.shape[0]
    table = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[1]), features.dtype)], axis=0
    )
    g = table[jnp.minimum(nbr, kin)]  # [Ko, D, Cin] — ONE gather
    # one big MXU contraction instead of D small matmuls (and one
    # scatter-add in the backward instead of D)
    out = jax.lax.dot_general(
        g.reshape(g.shape[0], -1),
        weights.reshape(-1, weights.shape[-1]),
        (((1,), (0,)), ((), ())),
    )
    return jnp.where(valid_out[:, None], out, 0.0)


def slice_gathered_matmul(
    features: jnp.ndarray,
    nbr: jnp.ndarray,
    weights: jnp.ndarray,
    valid_out: jnp.ndarray,
) -> jnp.ndarray:
    """``gathered_matmul`` with 3x fewer gather indices, exploiting sorted
    active sets.

    Sites are sorted by linear id, and each aligned group of 3 table
    columns (dx = -1, 0, +1 of one (dz, dy) plane — both the subm and the
    strided tables are built x-fastest) addresses 3 CONSECUTIVE linear ids.
    Whichever of those are active therefore occupy CONSECUTIVE feature
    rows, so one ``lax.gather`` with ``slice_sizes=(3, C)`` at the
    min-present row fetches the whole plane: 9 slice indices per site
    instead of 27 element indices (TPU gathers are index-rate-bound,
    ~10 ns/index — PERF.md). Fetched rows are routed to their taps with a
    cumsum one-hot einsum over the tiny 3-axis (no extra gathers; same
    trick as `_patch_cells`). Exactness vs ``gathered_matmul`` is covered
    by tests/test_sparse_conv.py.

    Only correct for D % 3 == 0 tables with the x-fastest column order and
    features in sorted-by-linear-id row order (the voxelizer/downsampler
    invariant); ``gathered_matmul`` remains the general form.
    """
    kin = features.shape[0]
    c = features.shape[1]
    d = nbr.shape[1]
    assert d % 3 == 0, d
    # 3 zero rows: a miss-plane anchor of `kin` (and a last-real-row anchor
    # of kin-1) must never CLIP-shift into real rows, or present taps would
    # misroute.
    table = jnp.concatenate([features, jnp.zeros((3, c), features.dtype)], axis=0)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )
    out = jnp.zeros((nbr.shape[0], weights.shape[-1]), features.dtype)
    for plane in range(d // 3):
        rows3 = nbr[:, plane * 3 : plane * 3 + 3]  # [Ko, 3]
        present = rows3 != kin
        anchor = jnp.min(jnp.where(present, rows3, kin + 1), axis=1)
        anchor = jnp.minimum(anchor, kin)  # all-miss plane -> zero rows
        fetched = jax.lax.gather(
            table,
            anchor[:, None].astype(jnp.int32),
            dn,
            slice_sizes=(3, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # [Ko, 3, C]
        # tap t reads fetched[j] where j = #present taps before t
        pi = present.astype(jnp.int32)
        before = jnp.cumsum(pi, axis=1) - pi
        route = (
            (before[:, :, None] == jnp.arange(3)[None, None, :]) & present[:, :, None]
        ).astype(features.dtype)
        tapped = jnp.einsum("ktj,kjc->ktc", route, fetched)  # [Ko, 3, C]
        w3 = weights[plane * 3 : plane * 3 + 3].reshape(3 * c, -1)
        out = out + jax.lax.dot_general(
            tapped.reshape(tapped.shape[0], 3 * c), w3, (((1,), (0,)), ((), ()))
        )
    return jnp.where(valid_out[:, None], out, 0.0)


def subm_conv(
    st: SparseTensor,
    nbr: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> SparseTensor:
    """Submanifold conv with a precomputed neighbor table (shared per stage)."""
    out = gathered_matmul(st.features, nbr, weights, st.valid)
    if bias is not None:
        out = jnp.where(st.valid[:, None], out + bias, 0.0)
    return SparseTensor(out, st.coords, st.valid, st.shape)


def _out_shape(shape, kernel, stride, padding):
    return tuple(
        (shape[i] + 2 * padding[i] - kernel[i]) // stride[i] + 1 for i in range(3)
    )


def downsample_candidates(
    coords: jnp.ndarray,  # [K, 3]
    valid: jnp.ndarray,  # [K]
    shape,
    kernel: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    padding: Tuple[int, int, int],
) -> jnp.ndarray:
    """[8K] candidate output linear ids (invalid = sentinel n_cells).

    Output site o covers input x iff x ∈ [o*s - p, o*s - p + k - 1]; per
    axis an input contributes to at most ceil(k/s) outputs (= 2 for k=3,
    s=2). spconv generates exactly this site set.
    """
    oshape = _out_shape(shape, kernel, stride, padding)

    def axis_candidates(x, k, s, p, n_out):
        # candidate outputs: floor((x+p)/s) and floor((x+p)/s)-1 ... down to
        # ceil((x+p-k+1)/s); for k<=2s at most 2 candidates
        hi = jnp.floor_divide(x + p, s)
        lo = -jnp.floor_divide(-(x + p - k + 1), s)
        c0 = hi
        c1 = jnp.maximum(hi - 1, lo)
        v0 = (c0 >= lo) & (c0 >= 0) & (c0 < n_out)
        v1 = (c1 < hi) & (c1 >= 0) & (c1 < n_out)
        return (c0, v0), (c1, v1)

    zc = axis_candidates(coords[:, 0], kernel[0], stride[0], padding[0], oshape[0])
    yc = axis_candidates(coords[:, 1], kernel[1], stride[1], padding[1], oshape[1])
    xc = axis_candidates(coords[:, 2], kernel[2], stride[2], padding[2], oshape[2])

    onz, ony, onx = oshape
    sentinel = onz * ony * onx
    cand_ids = []
    for cz, vz in zc:
        for cy, vy in yc:
            for cx, vx in xc:
                ok = vz & vy & vx & valid
                lid = (cz * ony + cy) * onx + cx
                cand_ids.append(jnp.where(ok, lid, sentinel))
    return jnp.concatenate(cand_ids)  # [8K]


def _sites_from_sorted(s_ids, oshape, out_capacity: int):
    """Dedupe a SORTED candidate-id array (sentinel = prod(oshape) last)
    into (ocoords, valid_out)."""
    onz, ony, onx = oshape
    sentinel = onz * ony * onx
    first = jnp.concatenate(
        [jnp.array([True]), s_ids[1:] != s_ids[:-1]]
    ) & (s_ids != sentinel)
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    keep = first & (rank < out_capacity)
    out_ids = jnp.full((out_capacity,), sentinel, jnp.int32)
    out_ids = out_ids.at[jnp.where(keep, rank, out_capacity)].set(
        jnp.where(keep, s_ids, sentinel), mode="drop"
    )
    n_out = jnp.sum(keep).astype(jnp.int32)
    valid_out = jnp.arange(out_capacity, dtype=jnp.int32) < n_out
    oz = out_ids // (ony * onx)
    oy = (out_ids // onx) % ony
    ox = out_ids % onx
    ocoords = jnp.stack(
        [jnp.where(valid_out, oz, 0), jnp.where(valid_out, oy, 0), jnp.where(valid_out, ox, 0)],
        axis=1,
    ).astype(jnp.int32)
    return ocoords, valid_out


def downsample_sites(
    st: SparseTensor,
    kernel: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    padding: Tuple[int, int, int],
    out_capacity: int,
):
    """Generate the strided conv's output active set (sorted, deduped).

    Overflow beyond ``out_capacity`` keeps smallest linear ids (documented
    deterministic deviation; see ops/voxelize.py).
    """
    oshape = _out_shape(st.shape, kernel, stride, padding)
    all_ids = downsample_candidates(
        st.coords, st.valid, st.shape, kernel, stride, padding
    )
    s_ids = jax.lax.sort((all_ids,), is_stable=False)[0]
    ocoords, valid_out = _sites_from_sorted(s_ids, oshape, out_capacity)
    return ocoords, valid_out, oshape


def downsample_sites_batched(
    coords: jnp.ndarray,  # [B, K, 3]
    valid: jnp.ndarray,  # [B, K]
    shape,
    kernel: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    padding: Tuple[int, int, int],
    out_capacity: int,
):
    """Batched site generation; ONE flat sort at b == 1.

    A vmapped/batched [B, N] sort lowers ~4x slower than a flat 1-D sort
    on TPU (measured 18.8 vs 4.9 ms at 1.28M keys), so at b == 1 the keys
    ride one flat unstable sort. At b > 1 the sort stays per sample: a
    flat sort across the batch forces an all-gather + replicated sort on a
    data-sharded mesh (see ops/voxelize.py::voxelize_batched), which both
    costs more than the batched-sort penalty and breaks collective-free
    DP serving. Requires B * (prod(oshape) + 1) < 2^31 at b == 1.
    """
    b = coords.shape[0]
    oshape = _out_shape(shape, kernel, stride, padding)
    onz, ony, onx = oshape
    sentinel = onz * ony * onx
    cands = jax.vmap(
        lambda c, v: downsample_candidates(c, v, shape, kernel, stride, padding)
    )(coords, valid)  # [B, 8K]
    if b > 1:
        s_ids = jax.vmap(lambda f: jax.lax.sort((f,), is_stable=False)[0])(cands)
    else:
        assert b * (sentinel + 1) < 2**31, "flat-sort row offsets overflow int32"
        offs = (jnp.arange(b, dtype=jnp.int32) * (sentinel + 1))[:, None]
        flat = (cands + offs).reshape(-1)
        s_flat = jax.lax.sort((flat,), is_stable=False)[0]
        s_ids = s_flat.reshape(b, -1) - offs
    ocoords, valid_out = jax.vmap(
        lambda s: _sites_from_sorted(s, oshape, out_capacity)
    )(s_ids)
    return ocoords, valid_out, oshape


def strided_neighbor_table(
    in_st: SparseTensor,
    out_coords: jnp.ndarray,
    out_valid: jnp.ndarray,
    kernel: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    padding: Tuple[int, int, int],
    dense_map: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[Ko, prod(kernel)] input indices for a strided sparse conv."""
    nz, ny, nx = in_st.shape
    k = in_st.coords.shape[0]
    n = nz * ny * nx
    if tuple(kernel) == (3, 3, 3) and dense_map is None and _USE_M3:
        if n <= _M9_CELL_LIMIT:
            m9 = dense_index_map9(in_st)
            tables = []
            for dz in range(3):
                tz = out_coords[:, 0] * stride[0] - padding[0] + dz
                cy = out_coords[:, 1] * stride[1] - padding[1] + 1
                cx = out_coords[:, 2] * stride[2] - padding[2] + 1
                base = (tz * ny + cy) * nx + cx
                rows = m9[jnp.clip(base, 0, n - 1)]  # [Ko, 9]
                zok = ((tz >= 0) & (tz < nz)) & out_valid
                for i in range(9):
                    dy, dx = i // 3, i % 3
                    ty = out_coords[:, 1] * stride[1] - padding[1] + dy
                    tx = out_coords[:, 2] * stride[2] - padding[2] + dx
                    inb = zok & (ty >= 0) & (ty < ny) & (tx >= 0) & (tx < nx)
                    tables.append(jnp.where(inb, rows[:, i], k))
            return jnp.stack(tables, axis=1).astype(jnp.int32)
        # fetch each (dz, dy) group's three x-taps as one 3-wide row
        # gather from the x-widened map (see dense_index_map3)
        m3 = dense_index_map3(in_st)
        tables = []
        for dz in range(3):
            for dy in range(3):
                tz = out_coords[:, 0] * stride[0] - padding[0] + dz
                ty = out_coords[:, 1] * stride[1] - padding[1] + dy
                cx = out_coords[:, 2] * stride[2] - padding[2] + 1
                base = (tz * ny + ty) * nx + cx
                rows = m3[jnp.clip(base, 0, n - 1)]  # [Ko, 3] = dx 0,1,2
                zyok = (
                    (tz >= 0) & (tz < nz) & (ty >= 0) & (ty < ny)
                ) & out_valid
                for i in range(3):
                    tx = out_coords[:, 2] * stride[2] - padding[2] + i
                    inb = zyok & (tx >= 0) & (tx < nx)
                    tables.append(jnp.where(inb, rows[:, i], k))
        return jnp.stack(tables, axis=1).astype(jnp.int32)
    if dense_map is None:
        dense_map = dense_index_map(in_st)
    tables = []
    for dz, dy, dx in _kernel_offsets(kernel):
        tz = out_coords[:, 0] * stride[0] - padding[0] + dz
        ty = out_coords[:, 1] * stride[1] - padding[1] + dy
        tx = out_coords[:, 2] * stride[2] - padding[2] + dx
        inb = (
            (tz >= 0) & (tz < nz) & (ty >= 0) & (ty < ny) & (tx >= 0) & (tx < nx)
        ) & out_valid
        tid = (tz * ny + ty) * nx + tx
        pos = dense_map[jnp.clip(tid, 0, nz * ny * nx - 1)]
        tables.append(jnp.where(inb, pos, k))
    return jnp.stack(tables, axis=1).astype(jnp.int32)


def sparse_conv_downsample(
    st: SparseTensor,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None,
    kernel: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    padding: Tuple[int, int, int],
    out_capacity: int,
) -> SparseTensor:
    """spconv ``SparseConv3d`` with stride (site-generating)."""
    ocoords, ovalid, oshape = downsample_sites(st, kernel, stride, padding, out_capacity)
    nbr = strided_neighbor_table(st, ocoords, ovalid, kernel, stride, padding)
    out = gathered_matmul(st.features, nbr, weights, ovalid)
    if bias is not None:
        out = jnp.where(ovalid[:, None], out + bias, 0.0)
    return SparseTensor(out, ocoords, ovalid, oshape)


def scatter_dense(st: SparseTensor, dtype=None) -> jnp.ndarray:
    """[nz, ny, nx, C] zero-filled dense tensor of the active features."""
    nz, ny, nx = st.shape
    c = st.features.shape[1]
    feats = st.features if dtype is None else st.features.astype(dtype)
    dense = jnp.zeros((nz, ny, nx, c), feats.dtype)
    z = jnp.where(st.valid, st.coords[:, 0], nz)
    y = jnp.where(st.valid, st.coords[:, 1], 0)
    x = jnp.where(st.valid, st.coords[:, 2], 0)
    return dense.at[z, y, x].set(
        jnp.where(st.valid[:, None], feats, 0), mode="drop"
    )


def gather_sites(dense: jnp.ndarray, coords: jnp.ndarray, valid: jnp.ndarray):
    """Read dense [nz, ny, nx, C] back at the active sites."""
    nz = dense.shape[0]
    z = jnp.where(valid, coords[:, 0], 0)
    out = dense[z, coords[:, 1], coords[:, 2]]
    return jnp.where(valid[:, None], out, 0)


def _conv3d(dense: jnp.ndarray, weights: jnp.ndarray, kernel, stride, padding):
    """lhs [nz, ny, nx, Cin]; weights [prod(kernel), Cin, Cout] in the
    (dz, dy, dx) row-major tap order of ``_kernel_offsets``."""
    kz, ky, kx = kernel
    rhs = weights.reshape(kz, ky, kx, weights.shape[1], weights.shape[2])
    out = jax.lax.conv_general_dilated(
        dense[None],
        rhs,
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return out[0]


def subm_conv_dense(
    st: SparseTensor, weights: jnp.ndarray, kernel=(3, 3, 3)
) -> jnp.ndarray:
    """Submanifold conv via dense conv3d: scatter the active features into a
    zero-filled grid, convolve on the MXU, gather back at the active sites.

    Exactly equivalent to the gather formulation (inactive sites are zero,
    so they contribute nothing), but replaces the 27-way row gather — which
    is element-rate-bound and ~100x below HBM bandwidth on TPU — with a
    conv XLA maps natively onto the MXU, plus ONE scatter and ONE gather.
    HBM cost: the dense grid (41x1440x1440x16 fp32 = 5.4 GB at stage 0),
    a deliberate memory-for-speed trade at eval capacity.
    """
    r = [k // 2 for k in kernel]
    dense = scatter_dense(st)
    out = _conv3d(dense, weights, kernel, (1, 1, 1), r)
    return gather_sites(out, st.coords, st.valid)


def strided_conv_dense(
    st: SparseTensor,
    weights: jnp.ndarray,
    kernel: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    padding: Tuple[int, int, int],
    out_capacity: int,
) -> SparseTensor:
    """Strided sparse conv via dense conv3d + site generation."""
    ocoords, ovalid, oshape = downsample_sites(st, kernel, stride, padding, out_capacity)
    dense = scatter_dense(st)
    out = _conv3d(dense, weights, kernel, stride, padding)
    feats = gather_sites(out, ocoords, ovalid)
    return SparseTensor(feats, ocoords, ovalid, oshape)


def s2d_weight_transform(weights: jnp.ndarray, kernel=(3, 3, 3)) -> jnp.ndarray:
    """[27, Cin, Cout] -> [27, 8*Cin, 8*Cout] packed (2,2,2) conv weights.

    Out[2A+a] = sum_d W[d] in[2A+a+d]; writing a+d = 2*delta + b with
    b in {0,1}^3 gives the packed tap (delta) and input block (b):
        Wp[delta][b*Cin:(b+1)Cin, a*Cout:(a+1)Cout] = W[d].
    Block index order (bz*2+by)*2+bx matches scatter_dense_packed.
    """
    import numpy as np_

    kz, ky, kx = kernel
    assert (kz, ky, kx) == (3, 3, 3)
    cin, cout = weights.shape[1], weights.shape[2]
    wp = jnp.zeros((27, 8 * cin, 8 * cout), weights.dtype)
    for ai, (az, ay, ax) in enumerate(
        [(z, y, x) for z in range(2) for y in range(2) for x in range(2)]
    ):
        for di, (dz, dy, dx) in enumerate(_kernel_offsets(kernel)):
            s = (az + dz - 1, ay + dy - 1, ax + dx - 1)
            delta = tuple(v // 2 for v in s)
            b = tuple(v % 2 for v in s)
            ti = ((delta[0] + 1) * 3 + (delta[1] + 1)) * 3 + (delta[2] + 1)
            bi = (b[0] * 2 + b[1]) * 2 + b[2]
            wp = wp.at[
                ti, bi * cin : (bi + 1) * cin, ai * cout : (ai + 1) * cout
            ].set(weights[di])
    del np_
    return wp


def scatter_dense_packed(st: SparseTensor, dtype=None) -> jnp.ndarray:
    """(2,2,2) space-to-depth packed dense grid:
    [ceil(nz/2), ceil(ny/2), ceil(nx/2), 8*C] with block (z%2, y%2, x%2)."""
    nz, ny, nx = st.shape
    pz, py, px = -(-nz // 2), -(-ny // 2), -(-nx // 2)
    c = st.features.shape[1]
    feats = st.features if dtype is None else st.features.astype(dtype)
    z = jnp.where(st.valid, st.coords[:, 0], 2 * pz)
    y = jnp.where(st.valid, st.coords[:, 1], 0)
    x = jnp.where(st.valid, st.coords[:, 2], 0)
    blk = ((z % 2) * 2 + (y % 2)) * 2 + (x % 2)
    # expand each row to the full 8C lane width BEFORE scattering — a
    # [cells, 8, C] layout would lane-pad C to 128 and blow up HBM 8x
    onehot = jax.nn.one_hot(blk, 8, dtype=feats.dtype)  # [K, 8]
    f_exp = (onehot[:, :, None] * feats[:, None, :]).reshape(-1, 8 * c)
    f_exp = jnp.where(st.valid[:, None], f_exp, 0)
    dense = jnp.zeros((pz, py, px, 8 * c), feats.dtype)
    # blocks are disjoint per (cell, site), so add accumulates correctly
    return dense.at[z // 2, y // 2, x // 2].add(f_exp, mode="drop")


def gather_sites_packed(dense: jnp.ndarray, coords, valid, c: int):
    """Read packed dense [pz, py, px, 8*C] at active sites' blocks."""
    pz = dense.shape[0]
    z = jnp.where(valid, coords[:, 0], 0)
    y, x = coords[:, 1], coords[:, 2]
    blk = ((z % 2) * 2 + (y % 2)) * 2 + (x % 2)
    cell = dense[z // 2, y // 2, x // 2].reshape(-1, 8, c)
    out = jnp.take_along_axis(cell, blk[:, None, None], axis=1)[:, 0]
    return jnp.where(valid[:, None], out, 0)


def subm_conv_s2d(
    st: SparseTensor, weights: jnp.ndarray, compute_dtype=jnp.bfloat16
) -> jnp.ndarray:
    """Submanifold 3x3x3 conv via (2,2,2) space-to-depth dense conv.

    Same exact math as the gather/dense formulations, but the packed layout
    puts 8*C channels in the lane dimension (C=16 -> 128, zero lane-padding
    waste), so stage-0-sized grids fit in HBM and the conv runs on the MXU:
    [21, 720, 720, 128] bf16 = 2.8 GB vs 43 GB for the naive dense layout.
    FLOP inflation is 8x (the packed 27-tap kernel is 12.5%-dense
    block-sparse and XLA computes the zeros), a good trade against
    element-rate-bound gathers. ``compute_dtype`` bf16 by default (the conv
    accumulates fp32 via preferred_element_type).
    """
    c = st.features.shape[1]
    dense = scatter_dense_packed(st, compute_dtype)
    wp = s2d_weight_transform(weights).astype(compute_dtype)
    out = _conv3d(dense, wp, (3, 3, 3), (1, 1, 1), (1, 1, 1))
    return gather_sites_packed(
        out.astype(st.features.dtype), st.coords, st.valid, weights.shape[2]
    )


def to_dense_bev(st: SparseTensor) -> jnp.ndarray:
    """Scatter to dense [ny, nx, nz*C] with channel index c*nz + z.

    Matches the reference's ``out.dense().view(N, C*D, H, W)`` channel fold
    (mmdet3d SparseEncoder.forward) so converted torch weights line up.
    """
    nz, ny, nx = st.shape
    c = st.features.shape[1]
    dense = jnp.zeros((nz, ny, nx, c), st.features.dtype)
    z = jnp.where(st.valid, st.coords[:, 0], nz)
    y = jnp.where(st.valid, st.coords[:, 1], 0)
    x = jnp.where(st.valid, st.coords[:, 2], 0)
    dense = dense.at[z, y, x].set(
        jnp.where(st.valid[:, None], st.features, 0.0), mode="drop"
    )
    # [nz, ny, nx, C] -> [ny, nx, C, nz] -> [ny, nx, C*nz] with c*nz + z
    return jnp.transpose(dense, (1, 2, 3, 0)).reshape(ny, nx, c * nz)
