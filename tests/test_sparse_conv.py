import jax.numpy as jnp
import numpy as np

from deepinteraction_tpu.ops.sparse_conv import (
    SparseTensor,
    linear_ids,
    sparse_conv_downsample,
    subm_conv,
    subm_neighbor_table,
    to_dense_bev,
)


def _make_sparse(rng, shape, n_active, c, capacity):
    nz, ny, nx = shape
    # unique random coords
    all_ids = rng.permutation(nz * ny * nx)[:n_active]
    all_ids = np.sort(all_ids)
    coords = np.stack(
        [all_ids // (ny * nx), (all_ids // nx) % ny, all_ids % nx], axis=1
    ).astype(np.int32)
    feats = rng.normal(size=(n_active, c)).astype(np.float32)
    # pad to capacity
    pad = capacity - n_active
    coords = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
    feats = np.concatenate([feats, np.zeros((pad, c), np.float32)])
    valid = np.arange(capacity) < n_active
    return SparseTensor(
        jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid), shape
    )


def _dense_of(st):
    nz, ny, nx = st.shape
    c = st.features.shape[1]
    d = np.zeros((nz, ny, nx, c), np.float32)
    coords = np.asarray(st.coords)
    feats = np.asarray(st.features)
    val = np.asarray(st.valid)
    for i in range(coords.shape[0]):
        if val[i]:
            d[coords[i, 0], coords[i, 1], coords[i, 2]] = feats[i]
    return d


def _dense_conv3d(dense, w, stride, padding):
    """naive dense 3D conv oracle. w: [kz,ky,kx,ci,co] -> out dense grid"""
    nz, ny, nx, ci = dense.shape
    kz, ky, kx = w.shape[:3]
    sz, sy, sx = stride
    pz, py, px = padding
    oz = (nz + 2 * pz - kz) // sz + 1
    oy = (ny + 2 * py - ky) // sy + 1
    ox = (nx + 2 * px - kx) // sx + 1
    pad = np.zeros((nz + 2 * pz, ny + 2 * py, nx + 2 * px, ci), np.float32)
    pad[pz : pz + nz, py : py + ny, px : px + nx] = dense
    out = np.zeros((oz, oy, ox, w.shape[4]), np.float32)
    for z in range(oz):
        for y in range(oy):
            for x in range(ox):
                patch = pad[
                    z * sz : z * sz + kz, y * sy : y * sy + ky, x * sx : x * sx + kx
                ]
                out[z, y, x] = np.tensordot(patch, w, axes=([0, 1, 2, 3], [0, 1, 2, 3]))
    return out


def test_subm_conv_matches_dense_at_active_sites():
    rng = np.random.default_rng(0)
    shape = (5, 6, 7)
    st = _make_sparse(rng, shape, 40, 4, 64)
    w = rng.normal(size=(3, 3, 3, 4, 8)).astype(np.float32) * 0.3
    nbr = subm_neighbor_table(st, (3, 3, 3))
    out = subm_conv(st, nbr, jnp.asarray(w.reshape(27, 4, 8)))
    dense = _dense_of(st)
    expect = _dense_conv3d(dense, w, (1, 1, 1), (1, 1, 1))
    coords = np.asarray(st.coords)
    val = np.asarray(st.valid)
    got = np.asarray(out.features)
    for i in range(64):
        if val[i]:
            np.testing.assert_allclose(
                got[i],
                expect[coords[i, 0], coords[i, 1], coords[i, 2]],
                rtol=1e-4,
                atol=1e-5,
            )


def test_strided_conv_matches_dense():
    rng = np.random.default_rng(1)
    shape = (8, 8, 8)
    st = _make_sparse(rng, shape, 50, 3, 64)
    w = rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32) * 0.3
    out = sparse_conv_downsample(
        st, jnp.asarray(w.reshape(27, 3, 5)), None, (3, 3, 3), (2, 2, 2), (1, 1, 1), 64
    )
    dense = _dense_of(st)
    expect = _dense_conv3d(dense, w, (2, 2, 2), (1, 1, 1))
    got = np.asarray(out.features)
    coords = np.asarray(out.coords)
    val = np.asarray(out.valid)
    assert val.sum() > 0
    for i in range(64):
        if val[i]:
            np.testing.assert_allclose(
                got[i],
                expect[coords[i, 0], coords[i, 1], coords[i, 2]],
                rtol=1e-4,
                atol=1e-5,
            )
    # every nonzero dense output site is in the generated active set
    nonzero = np.argwhere(np.abs(expect).sum(-1) > 1e-5)
    active = {tuple(coords[i]) for i in range(64) if val[i]}
    for site in nonzero:
        assert tuple(site) in active


def test_strided_zpad0_axis():
    """conv_out-style kernel (3,1,1) stride (2,1,1) pad (0,0,0)."""
    rng = np.random.default_rng(2)
    shape = (5, 4, 4)
    st = _make_sparse(rng, shape, 30, 3, 40)
    w = rng.normal(size=(3, 1, 1, 3, 4)).astype(np.float32)
    out = sparse_conv_downsample(
        st, jnp.asarray(w.reshape(3, 3, 4)), None, (3, 1, 1), (2, 1, 1), (0, 0, 0), 40
    )
    dense = _dense_of(st)
    expect = _dense_conv3d(dense, w, (2, 1, 1), (0, 0, 0))
    coords = np.asarray(out.coords)
    val = np.asarray(out.valid)
    got = np.asarray(out.features)
    assert out.shape == (2, 4, 4)
    for i in range(40):
        if val[i]:
            np.testing.assert_allclose(
                got[i], expect[coords[i, 0], coords[i, 1], coords[i, 2]], rtol=1e-4, atol=1e-5
            )


def test_to_dense_bev_channel_fold():
    feats = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    coords = jnp.asarray([[0, 1, 1], [1, 0, 2]], jnp.int32)
    st = SparseTensor(feats, coords, jnp.asarray([True, True]), (2, 3, 4))
    bev = np.asarray(to_dense_bev(st))
    assert bev.shape == (3, 4, 4)  # ny, nx, C*nz
    # channel index = c*nz + z
    assert bev[1, 1, 0 * 2 + 0] == 1.0
    assert bev[1, 1, 1 * 2 + 0] == 2.0
    assert bev[0, 2, 0 * 2 + 1] == 3.0
    assert bev[0, 2, 1 * 2 + 1] == 4.0


def test_dense_impl_matches_gather():
    """subm_conv_dense / strided_conv_dense == the gather formulation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepinteraction_tpu.ops import sparse_conv as sc

    rng = np.random.default_rng(3)
    shape = (5, 12, 12)
    total = shape[0] * shape[1] * shape[2]
    k = 50
    ids = np.sort(rng.choice(total, 40, replace=False))
    coords = np.zeros((k, 3), np.int32)
    coords[:40, 0] = ids // (shape[1] * shape[2])
    coords[:40, 1] = (ids // shape[2]) % shape[1]
    coords[:40, 2] = ids % shape[2]
    valid = np.arange(k) < 40
    feats = jnp.asarray(rng.normal(size=(k, 4)).astype(np.float32))
    feats = jnp.where(jnp.asarray(valid)[:, None], feats, 0.0)
    st = sc.SparseTensor(feats, jnp.asarray(coords), jnp.asarray(valid), shape)
    w = jnp.asarray(rng.normal(size=(27, 4, 6)).astype(np.float32))

    nbr = sc.subm_neighbor_table(st)
    ref = sc.gathered_matmul(feats, nbr, w, st.valid)
    out = sc.subm_conv_dense(st, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    wd = jnp.asarray(rng.normal(size=(27, 4, 8)).astype(np.float32))
    ref_d = sc.sparse_conv_downsample(st, wd, None, (3, 3, 3), (2, 2, 2), (1, 1, 1), 30)
    out_d = sc.strided_conv_dense(st, wd, (3, 3, 3), (2, 2, 2), (1, 1, 1), 30)
    np.testing.assert_array_equal(np.asarray(ref_d.coords), np.asarray(out_d.coords))
    np.testing.assert_allclose(
        np.asarray(out_d.features), np.asarray(ref_d.features), atol=1e-4
    )


def test_s2d_impl_matches_gather():
    """(2,2,2) space-to-depth packed conv == the gather formulation."""
    import jax.numpy as jnp
    import numpy as np

    from deepinteraction_tpu.ops import sparse_conv as sc

    rng = np.random.default_rng(7)
    shape = (5, 11, 12)  # odd dims exercise the ceil-packing edge
    total = shape[0] * shape[1] * shape[2]
    k = 60
    ids = np.sort(rng.choice(total, 45, replace=False))
    coords = np.zeros((k, 3), np.int32)
    coords[:45, 0] = ids // (shape[1] * shape[2])
    coords[:45, 1] = (ids // shape[2]) % shape[1]
    coords[:45, 2] = ids % shape[2]
    valid = np.arange(k) < 45
    feats = jnp.asarray(rng.normal(size=(k, 4)).astype(np.float32))
    feats = jnp.where(jnp.asarray(valid)[:, None], feats, 0.0)
    st = sc.SparseTensor(feats, jnp.asarray(coords), jnp.asarray(valid), shape)
    w = jnp.asarray(rng.normal(size=(27, 4, 6)).astype(np.float32))

    nbr = sc.subm_neighbor_table(st)
    ref = sc.gathered_matmul(feats, nbr, w, st.valid)
    out = sc.subm_conv_s2d(st, w, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # bf16 compute stays within half-precision tolerance
    out16 = sc.subm_conv_s2d(st, w, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(ref), atol=0.15, rtol=0.05)


def test_neighbor_tables_m3_vs_m9_vs_element(monkeypatch):
    """All three dense-map widths produce identical neighbor tables."""
    import deepinteraction_tpu.ops.sparse_conv as sc_mod

    rng = np.random.default_rng(3)
    st = _make_sparse(rng, (5, 12, 11), 140, 4, 160)

    monkeypatch.setattr(sc_mod, "_M9_CELL_LIMIT", 10**9)
    t9 = np.asarray(sc_mod.subm_neighbor_table(st))
    monkeypatch.setattr(sc_mod, "_M9_CELL_LIMIT", 0)
    t3 = np.asarray(sc_mod.subm_neighbor_table(st))
    monkeypatch.setattr(sc_mod, "_USE_M3", False)
    te = np.asarray(sc_mod.subm_neighbor_table(st))
    assert (t9 == te).all()
    assert (t3 == te).all()

    oc, ov, _ = sc_mod.downsample_sites(st, (3, 3, 3), (2, 2, 2), (1, 1, 1), 120)
    se = np.asarray(
        sc_mod.strided_neighbor_table(st, oc, ov, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    )
    monkeypatch.setattr(sc_mod, "_USE_M3", True)
    s3 = np.asarray(
        sc_mod.strided_neighbor_table(st, oc, ov, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    )
    monkeypatch.setattr(sc_mod, "_M9_CELL_LIMIT", 10**9)
    s9 = np.asarray(
        sc_mod.strided_neighbor_table(st, oc, ov, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    )
    assert (s3 == se).all()
    assert (s9 == se).all()


def test_slice_gathered_matmul_matches_gathered_matmul():
    """The 9-slice-gather form is exact vs the 27-element-gather form, on
    both the subm and the strided tables, including a saturated active set
    (every row valid — exercises the end-of-array zero-row padding: a
    last-real-row anchor must not CLIP-shift onto real rows)."""
    import deepinteraction_tpu.ops.sparse_conv as sc_mod

    rng = np.random.default_rng(11)
    for n_active, cap in [(150, 180), (180, 180)]:  # padded + saturated
        st = _make_sparse(rng, (5, 12, 11), n_active, 8, cap)
        if n_active == cap:
            # saturated: fill coords/features of every row (sorted unique)
            ids = np.sort(rng.permutation(5 * 12 * 11)[:cap])
            coords = np.stack(
                [ids // (12 * 11), (ids // 11) % 12, ids % 11], 1
            ).astype(np.int32)
            st = SparseTensor(
                jnp.asarray(rng.normal(size=(cap, 8)).astype(np.float32)),
                jnp.asarray(coords),
                jnp.ones((cap,), bool),
                (5, 12, 11),
            )
        w = jnp.asarray(rng.normal(size=(27, 8, 6)).astype(np.float32))

        nbr = sc_mod.subm_neighbor_table(st)
        ref = np.asarray(sc_mod.gathered_matmul(st.features, nbr, w, st.valid))
        got = np.asarray(
            sc_mod.slice_gathered_matmul(st.features, nbr, w, st.valid)
        )
        np.testing.assert_allclose(got, ref, atol=2e-4)

        oc, ov, _ = sc_mod.downsample_sites(st, (3, 3, 3), (2, 2, 2), (1, 1, 1), 120)
        snbr = sc_mod.strided_neighbor_table(
            st, oc, ov, (3, 3, 3), (2, 2, 2), (1, 1, 1)
        )
        sref = np.asarray(sc_mod.gathered_matmul(st.features, snbr, w, ov))
        sgot = np.asarray(
            sc_mod.slice_gathered_matmul(st.features, snbr, w, ov)
        )
        np.testing.assert_allclose(sgot, sref, atol=2e-4)


def test_slice_gathered_matmul_grads_match():
    """sgather is selectable as the TRAIN impl (DI_SPARSE_TRAIN_IMPL):
    its gradients w.r.t. features and weights must match the element-gather
    form's."""
    import jax

    import deepinteraction_tpu.ops.sparse_conv as sc_mod

    rng = np.random.default_rng(13)
    st = _make_sparse(rng, (5, 12, 11), 150, 8, 180)
    w = jnp.asarray(rng.normal(size=(27, 8, 6)).astype(np.float32))
    nbr = sc_mod.subm_neighbor_table(st)

    def loss(fn, feats, w):
        return jnp.sum(fn(feats, nbr, w, st.valid) ** 2)

    gref = jax.grad(lambda f, w: loss(sc_mod.gathered_matmul, f, w), (0, 1))(
        st.features, w
    )
    ggot = jax.grad(
        lambda f, w: loss(sc_mod.slice_gathered_matmul, f, w), (0, 1)
    )(st.features, w)
    np.testing.assert_allclose(np.asarray(ggot[0]), np.asarray(gref[0]), atol=3e-3)
    np.testing.assert_allclose(np.asarray(ggot[1]), np.asarray(gref[1]), atol=3e-3)
