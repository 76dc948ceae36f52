"""Eval-time MSDA top-k point reduction (`DI_MSDA_EVAL_POINTS`).

The one-hot select in ``topk_points`` must match the obvious
``take_along_axis`` formulation (which we avoid in the model because it
re-introduces gather indices — PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinteraction_tpu.ops import deform_attn as da


@pytest.mark.parametrize("k", [1, 2, 3])
def test_topk_points_matches_take_along_axis(k):
    rng = np.random.default_rng(0)
    b, nq, h, l, p = 2, 5, 3, 4, 4
    offsets = jnp.asarray(rng.normal(size=(b, nq, h, l, p, 2)).astype(np.float32))
    logits = rng.normal(size=(b, nq, h, l * p)).astype(np.float32)
    weights = jax.nn.softmax(jnp.asarray(logits), axis=-1).reshape(b, nq, h, l, p)

    off_k, w_k = jax.jit(da.topk_points, static_argnums=2)(offsets, weights, k)

    topv, topi = jax.lax.top_k(weights, k)
    off_ref = jnp.take_along_axis(offsets, topi[..., None], axis=-2)
    w_ref = topv / jnp.sum(topv, axis=(-2, -1), keepdims=True)
    np.testing.assert_allclose(np.asarray(off_k), np.asarray(off_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_ref), atol=1e-6)
    # kept weights renormalize to 1 over (l, k)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(w_k, axis=(-2, -1))), 1.0, atol=1e-5
    )


def test_msda_topk_eval_runs_and_k_eq_p_exact(monkeypatch):
    rng = np.random.default_rng(1)
    shapes = [(8, 8), (4, 4)]
    nv = sum(hh * ww for hh, ww in shapes)
    query = jnp.asarray(rng.normal(size=(1, 10, 32)).astype(np.float32))
    value = jnp.asarray(rng.normal(size=(1, nv, 32)).astype(np.float32))
    ref = jnp.asarray(rng.uniform(0.2, 0.8, size=(1, 10, 2, 2)).astype(np.float32))

    mod = da.MSDeformableAttention(embed_dims=32, num_heads=4, num_levels=2, num_points=4)
    variables = mod.init(jax.random.PRNGKey(0), query, value, ref, shapes)
    # params are zero-init for offsets/weights; randomize to break ties
    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)) * 0.1,
        variables,
    )
    full = mod.apply(variables, query, value, ref, shapes)

    monkeypatch.setattr(da, "MSDA_EVAL_POINTS", 4)
    np.testing.assert_allclose(
        np.asarray(mod.apply(variables, query, value, ref, shapes)),
        np.asarray(full), atol=0,
    )

    monkeypatch.setattr(da, "MSDA_EVAL_POINTS", 2)
    red = mod.apply(variables, query, value, ref, shapes)
    assert np.isfinite(np.asarray(red)).all()
    assert red.shape == full.shape
    # reduced output stays close to full: kept points carry most softmax mass
    err = float(jnp.max(jnp.abs(red - full)))
    base = float(jnp.max(jnp.abs(full)))
    assert err < base  # sanity: a perturbation, not garbage


def _rand_msda_inputs(seed=2, b=2, nq=7, h=4, hd=8, shapes=((8, 8), (4, 4)), p=4):
    rng = np.random.default_rng(seed)
    l = len(shapes)
    nv = sum(hh * ww for hh, ww in shapes)
    v = jnp.asarray(rng.normal(size=(b, nv, h * hd)).astype(np.float32))
    offsets = jnp.asarray(rng.normal(size=(b, nq, h, l, p, 2)).astype(np.float32))
    logits = rng.normal(size=(b, nq, h, l * p)).astype(np.float32)
    weights = jax.nn.softmax(jnp.asarray(logits), -1).reshape(b, nq, h, l, p)
    ref = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, nq, l, 2)).astype(np.float32))
    return v, offsets, weights, ref, tuple(shapes)


def _naive_candidate_samples(v, offsets, ref, shapes, h, hd):
    """Per-candidate sampled features [B, Nq, h, L, P, hd] via the existing
    per-level patch sampler — an independent formulation of the same
    geometry (per-level tables + grid_sample vs one concatenated table)."""
    from deepinteraction_tpu.utils.geometry import (
        build_patch_table_flat,
        grid_sample_2d_views_patch_flat,
    )

    b, nq = offsets.shape[:2]
    l, p = offsets.shape[3], offsets.shape[4]
    sizes = [hh * ww for hh, ww in shapes]
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    per_level = []
    for li, (hh, ww) in enumerate(shapes):
        v_l = v[:, starts[li] : starts[li] + sizes[li]].reshape(b, hh, ww, h, hd)
        wh = jnp.asarray([ww, hh], jnp.float32)
        loc = ref[:, :, None, li, None, :] + offsets[:, :, :, li] / wh
        grid = loc * 2.0 - 1.0

        def one(vb, gb):
            table = build_patch_table_flat(jnp.transpose(vb, (2, 0, 1, 3)))
            hidx = jnp.broadcast_to(
                jnp.arange(h, dtype=jnp.int32)[None, :, None], gb.shape[:-1]
            )
            return grid_sample_2d_views_patch_flat(table, (h, hh, ww), gb, hidx)

        per_level.append(jax.vmap(one)(v_l, grid))  # [B, Nq, h, P, hd]
    return jnp.stack(per_level, axis=3)  # [B, Nq, h, L, P, hd]


@pytest.mark.parametrize("kj", [1, 3, 8])
def test_joint_topk_matches_naive_selection(kj):
    h, hd = 4, 8
    v, offsets, weights, ref, shapes = _rand_msda_inputs()
    out = jax.jit(da.joint_topk_sample, static_argnums=(4, 5))(
        v, offsets, weights, ref, shapes, kj
    )

    cand = _naive_candidate_samples(v, offsets, ref, shapes, h, hd)
    b, nq = offsets.shape[:2]
    l, p = offsets.shape[3], offsets.shape[4]
    wflat = weights.reshape(b, nq, h, l * p)
    cflat = cand.reshape(b, nq, h, l * p, hd)
    topv, topi = jax.lax.top_k(wflat, kj)
    kept = jnp.take_along_axis(cflat, topi[..., None], axis=-2)
    wk = topv / jnp.sum(topv, -1, keepdims=True)
    expect = jnp.sum(kept * wk[..., None], axis=-2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=2e-5)


def test_joint_topk_keep_all_equals_exact_path(monkeypatch):
    rng = np.random.default_rng(5)
    shapes = [(8, 8), (4, 4)]
    nv = sum(hh * ww for hh, ww in shapes)
    query = jnp.asarray(rng.normal(size=(1, 10, 32)).astype(np.float32))
    value = jnp.asarray(rng.normal(size=(1, nv, 32)).astype(np.float32))
    ref = jnp.asarray(rng.uniform(0.2, 0.8, size=(1, 10, 2, 2)).astype(np.float32))

    mod = da.MSDeformableAttention(embed_dims=32, num_heads=4, num_levels=2, num_points=4)
    variables = mod.init(jax.random.PRNGKey(0), query, value, ref, shapes)
    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)) * 0.1,
        variables,
    )
    full = mod.apply(variables, query, value, ref, shapes)

    # kj = L*P keeps every candidate: identical math, reassociated sums
    monkeypatch.setattr(da, "MSDA_JOINT_POINTS", 8)
    np.testing.assert_allclose(
        np.asarray(mod.apply(variables, query, value, ref, shapes)),
        np.asarray(full), atol=1e-5,
    )

    monkeypatch.setattr(da, "MSDA_JOINT_POINTS", 4)
    red = mod.apply(variables, query, value, ref, shapes)
    assert np.isfinite(np.asarray(red)).all() and red.shape == full.shape


def test_heads_major_value_projection_matches(monkeypatch):
    """DI_MSDA_HEADS_MAJOR computes the value projection directly in the
    [B, h, Nv, hd] layout (one einsum, no strided relayout). Same params,
    same math up to dot reassociation — outputs must match on the exact
    path, the joint-top-k path, and keep the nn.Dense param tree."""
    rng = np.random.default_rng(7)
    shapes = [(8, 8), (4, 4)]
    nv = sum(hh * ww for hh, ww in shapes)
    query = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
    value = jnp.asarray(rng.normal(size=(2, nv, 32)).astype(np.float32))
    ref = jnp.asarray(rng.uniform(0.2, 0.8, size=(2, 10, 2, 2)).astype(np.float32))

    mod = da.MSDeformableAttention(embed_dims=32, num_heads=4, num_levels=2, num_points=4)
    variables = mod.init(jax.random.PRNGKey(0), query, value, ref, shapes)
    vp = variables["params"]["value_proj"]
    assert vp["kernel"].shape == (32, 32) and vp["bias"].shape == (32,)
    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)) * 0.1,
        variables,
    )
    base = mod.apply(variables, query, value, ref, shapes)
    monkeypatch.setattr(da, "MSDA_HEADS_MAJOR", True)
    hm = mod.apply(variables, query, value, ref, shapes)
    np.testing.assert_allclose(np.asarray(hm), np.asarray(base), atol=2e-5)

    monkeypatch.setattr(da, "MSDA_JOINT_POINTS", 3)
    joint_hm = mod.apply(variables, query, value, ref, shapes)
    monkeypatch.setattr(da, "MSDA_HEADS_MAJOR", False)
    joint = mod.apply(variables, query, value, ref, shapes)
    np.testing.assert_allclose(np.asarray(joint_hm), np.asarray(joint), atol=2e-5)

    # train path always uses the flat projection (layout irrelevant under
    # autodiff; keeps the train graph unchanged)
    monkeypatch.setattr(da, "MSDA_JOINT_POINTS", 0)
    monkeypatch.setattr(da, "MSDA_HEADS_MAJOR", True)
    tr = mod.apply(
        variables, query, value, ref, shapes, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(np.asarray(tr)).all()


def test_point_weight_fold_matches_unfolded_combine():
    """grid_sample_2d_views_patch_flat(point_weights=w) must equal sampling
    without weights followed by the broadcast multiply — the fold moves the
    point weight into the [R, 4] cell weights (deform_attn per-level path;
    also what keeps the full-size ++ TRAIN step under HBM, PERF.md r4)."""
    from deepinteraction_tpu.utils.geometry import (
        build_patch_table_flat,
        grid_sample_2d_views_patch_flat,
    )

    rng = np.random.default_rng(7)
    v, hh, ww, c = 3, 6, 5, 16
    nq, p = 11, 4
    feats = jnp.asarray(rng.normal(size=(v, hh, ww, c)).astype(np.float32))
    table = build_patch_table_flat(feats)
    # include out-of-range points to exercise zero-padding semantics
    grid = jnp.asarray(rng.uniform(-1.3, 1.3, size=(nq, v, p, 2)).astype(np.float32))
    vidx = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32)[None, :, None], (nq, v, p))
    w = jnp.asarray(rng.uniform(0.0, 1.0, size=(nq, v, p)).astype(np.float32))

    plain = grid_sample_2d_views_patch_flat(table, (v, hh, ww), grid, vidx)
    folded = grid_sample_2d_views_patch_flat(
        table, (v, hh, ww), grid, vidx, point_weights=w
    )
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(plain * w[..., None]), rtol=2e-6, atol=2e-6
    )
    # and the fold is differentiable through both weights and table
    g = jax.grad(
        lambda t: jnp.sum(
            grid_sample_2d_views_patch_flat(
                t, (v, hh, ww), grid, vidx, point_weights=w
            )
        )
    )(table)
    assert np.isfinite(np.asarray(g)).all()
