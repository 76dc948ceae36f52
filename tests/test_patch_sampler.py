"""Patch-table bilinear sampler vs the plain 4-gather oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from deepinteraction_tpu.utils.geometry import (
    build_patch_table,
    build_patch_table_flat,
    grid_sample_2d_views,
    grid_sample_2d_views_patch,
    grid_sample_2d_views_patch_flat,
)


def test_patch_sampler_matches_views_sampler():
    v, h, w, c = 3, 9, 13, 8
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (v, h, w, c), jnp.float32)
    # coords spanning in-bounds, boundary, and well outside [-1, 1]
    grid = jax.random.uniform(
        jax.random.PRNGKey(1), (257, 2), minval=-1.6, maxval=1.6
    )
    vidx = jax.random.randint(jax.random.PRNGKey(2), (257,), 0, v)
    ref = grid_sample_2d_views(feats, grid, vidx)
    table = build_patch_table(feats)
    out = grid_sample_2d_views_patch(table, (v, h, w), grid, vidx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    flat = grid_sample_2d_views_patch_flat(
        build_patch_table_flat(feats), (v, h, w), grid, vidx
    )
    np.testing.assert_allclose(np.asarray(flat), np.asarray(ref), atol=1e-6)


def test_patch_sampler_exact_corners():
    """Integer-pixel coords hit single taps exactly, incl. view edges."""
    v, h, w, c = 2, 4, 6, 5
    feats = jnp.arange(v * h * w * c, dtype=jnp.float32).reshape(v, h, w, c)
    table = build_patch_table(feats)
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    gx = (xs.ravel() + 0.5) / w * 2.0 - 1.0
    gy = (ys.ravel() + 0.5) / h * 2.0 - 1.0
    grid = jnp.stack([gx, gy], -1)
    for view in range(v):
        vidx = jnp.full((h * w,), view, jnp.int32)
        out = grid_sample_2d_views_patch(table, (v, h, w), grid, vidx)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(feats[view].reshape(h * w, c)), atol=1e-5
        )


def test_combine_flat_cells_matmul_matches_slice(monkeypatch):
    """DI_MSDA_COMBINE=matmul (mask-matmul cell fold) must reproduce the
    slice-combine sum up to fp reassociation — it is a pure lowering
    choice for the same math (geometry.py::combine_flat_cells)."""
    import deepinteraction_tpu.utils.geometry as G

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(2, 37, 64)).astype(np.float32))
    wf = jnp.asarray(rng.normal(size=(2, 37, 4)).astype(np.float32))
    monkeypatch.setattr(G, "MSDA_COMBINE", "slice")
    a = G.combine_flat_cells(g, wf, 16)
    monkeypatch.setattr(G, "MSDA_COMBINE", "matmul")
    b = G.combine_flat_cells(g, wf, 16)
    assert a.shape == b.shape == (2, 37, 16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    # flat 2-D form (the per-level sampler's layout)
    monkeypatch.setattr(G, "MSDA_COMBINE", "slice")
    a2 = G.combine_flat_cells(g[0], wf[0], 16)
    monkeypatch.setattr(G, "MSDA_COMBINE", "matmul")
    b2 = G.combine_flat_cells(g[0], wf[0], 16)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), rtol=1e-5, atol=1e-5)


def test_take_rows_segsort_backward_matches_scatter(monkeypatch):
    """DI_GATHER_BWD=segsort (sort -> segmented suffix-combine -> unique
    boundary scatter) must reproduce the stock scatter-add gather
    transpose up to f32 reassociation — duplicate and missing row ids,
    under vmap, and through the full patch sampler."""
    import deepinteraction_tpu.utils.geometry as G

    rng = np.random.default_rng(7)
    t, r, c = 57, 301, 12
    table = jnp.asarray(rng.normal(size=(t, 4 * c)).astype(np.float32))
    # heavy duplication + some ids never hit
    ix = jnp.asarray(rng.integers(0, t // 2, size=r, dtype=np.int32))
    ct = jnp.asarray(rng.normal(size=(r, 4 * c)).astype(np.float32))

    monkeypatch.setattr(G, "GATHER_BWD_MIN_ROWS", 0)  # engage segsort at test sizes

    def loss(tb, impl):
        monkeypatch.setattr(G, "GATHER_BWD", impl)
        return jnp.vdot(G.take_rows(tb, ix), ct)

    g_scatter = jax.grad(lambda tb: loss(tb, "scatter"))(table)
    g_segsort = jax.grad(lambda tb: loss(tb, "segsort"))(table)
    np.testing.assert_allclose(
        np.asarray(g_segsort), np.asarray(g_scatter), rtol=1e-5, atol=1e-5
    )
    g_cumsum = jax.grad(lambda tb: loss(tb, "cumsum"))(table)
    np.testing.assert_allclose(
        np.asarray(g_cumsum), np.asarray(g_scatter), rtol=1e-4, atol=1e-4
    )
    # forward unchanged
    np.testing.assert_array_equal(
        np.asarray(G.take_rows(table, ix)), np.asarray(table[ix])
    )

    # vmapped (batched tables/indices), as the MSDA call sites use it
    tb_b = jnp.stack([table, table * 2.0])
    ix_b = jnp.stack([ix, ix[::-1]])
    ct_b = jnp.stack([ct, ct + 1.0])

    def bloss(tb, impl):
        monkeypatch.setattr(G, "GATHER_BWD", impl)
        g = jax.vmap(G.take_rows)(tb, ix_b)
        return jnp.vdot(g, ct_b)

    gb_s = jax.grad(lambda tb: bloss(tb, "scatter"))(tb_b)
    gb_q = jax.grad(lambda tb: bloss(tb, "segsort"))(tb_b)
    np.testing.assert_allclose(np.asarray(gb_q), np.asarray(gb_s), rtol=1e-5, atol=1e-5)

    # through the full sampler (grad w.r.t. the table feeding _patch_cells)
    v, h, w = 2, 5, 7
    feats = jnp.asarray(rng.normal(size=(v, h, w, c)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, size=(40, 2)).astype(np.float32))
    vidx = jnp.asarray(rng.integers(0, v, size=(40,), dtype=np.int32))
    cot = jnp.asarray(rng.normal(size=(40, c)).astype(np.float32))

    def sloss(f, impl):
        monkeypatch.setattr(G, "GATHER_BWD", impl)
        tbl = G.build_patch_table_flat(f)
        out = G.grid_sample_2d_views_patch_flat(tbl, (v, h, w), grid, vidx)
        return jnp.vdot(out, cot)

    gs = jax.grad(lambda f: sloss(f, "scatter"))(feats)
    gq = jax.grad(lambda f: sloss(f, "segsort"))(feats)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gs), rtol=1e-5, atol=1e-5)


def test_patch_flat_psum_fused_matches_composition(monkeypatch):
    """The fused sample+combine+point-sum op (custom chunked VJP) must
    reproduce sample-then-sum exactly in the forward and match the stock
    autodiff gradients for table, grid (via cell weights), and point
    weights — incl. with backward chunking engaged."""
    import deepinteraction_tpu.utils.geometry as G

    rng = np.random.default_rng(11)
    v, h, w, c, nq, p = 3, 6, 9, 8, 25, 4
    feats = jnp.asarray(rng.normal(size=(v, h, w, c)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, size=(nq, p, 2)).astype(np.float32))
    vidx = jnp.asarray(
        np.broadcast_to(rng.integers(0, v, size=(nq, 1), dtype=np.int32), (nq, p))
    )
    pw = jnp.asarray(rng.normal(size=(nq, p)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(nq, c)).astype(np.float32))

    def composed(f, g_, w_):
        tbl = G.build_patch_table_flat(f)
        s = G.grid_sample_2d_views_patch_flat(tbl, (v, h, w), g_, vidx, point_weights=w_)
        return jnp.sum(s.reshape(nq, p, c), axis=1)

    def fused(f, g_, w_):
        tbl = G.build_patch_table_flat(f)
        return G.grid_sample_2d_views_patch_flat_psum(tbl, (v, h, w), g_, vidx, w_)

    # forward: identical math
    np.testing.assert_allclose(
        np.asarray(fused(feats, grid, pw)),
        np.asarray(composed(feats, grid, pw)),
        rtol=1e-5,
        atol=1e-6,
    )

    monkeypatch.setattr(G, "GATHER_BWD_MIN_ROWS", 0)
    for impl, chunks in (("segsort", 1), ("segsort", 4), ("cumsum", 4)):
        monkeypatch.setattr(G, "GATHER_BWD", impl)
        monkeypatch.setattr(G, "GATHER_BWD_CHUNKS", chunks)
        lo = lambda fn: lambda *a: jnp.vdot(fn(*a), cot)
        gf = jax.grad(lo(fused), argnums=(0, 1, 2))(feats, grid, pw)
        gc = jax.grad(lo(composed), argnums=(0, 1, 2))(feats, grid, pw)
        for a, b_, name in zip(gf, gc, ("feats", "grid", "pw")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5,
                err_msg=f"{name} grad ({impl}, chunks={chunks})",
            )
