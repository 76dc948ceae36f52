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
