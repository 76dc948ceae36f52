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
