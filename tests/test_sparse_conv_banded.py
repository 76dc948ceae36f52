"""Banded Pallas submanifold conv vs the XLA gather oracle.

Runs on the CPU test platform in Pallas interpret mode (the kernel itself is
identical math; Mosaic compilation is exercised on TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinteraction_tpu.ops import sparse_conv as sc
from deepinteraction_tpu.ops import sparse_conv_banded as scb

SHAPE = (9, 48, 48)


def _make(rng, n_active, c, capacity):
    ids = np.sort(rng.permutation(np.prod(SHAPE))[:n_active])
    coords = np.stack(
        [ids // (SHAPE[1] * SHAPE[2]), (ids // SHAPE[2]) % SHAPE[1],
         ids % SHAPE[2]], axis=1).astype(np.int32)
    coords = np.concatenate([coords, np.zeros((capacity - n_active, 3), np.int32)])
    feats = rng.normal(size=(capacity, c)).astype(np.float32)
    valid = np.arange(capacity) < n_active
    feats[~valid] = 0
    return (jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid))


@pytest.mark.parametrize("c,cout", [(16, 16), (8, 32)])
def test_banded_matches_gather(c, cout):
    rng = np.random.default_rng(0)
    cap = 640
    feats, coords, valid = _make(rng, 500, c, cap)
    st = sc.SparseTensor(feats, coords, valid, SHAPE)
    nbr = sc.subm_neighbor_table(st)
    w = rng.normal(size=(27, c, cout)).astype(np.float32) * 0.2
    w = jnp.asarray(w)

    ref = sc.gathered_matmul(feats, nbr, w.reshape(27 * c, cout), valid)
    plan = scb.make_banded_plan(nbr, valid, T=128, W=512)
    assert not bool(plan.ovf)
    out = scb.banded_subm_conv(128, 512, True, feats, w, valid, nbr, plan)
    ref, out = np.asarray(ref), np.asarray(out)
    scale = np.abs(ref).max()
    assert np.abs(ref - out).max() / scale < 2e-2  # bf16 matmul tolerance


def test_banded_overflow_falls_back_exactly():
    rng = np.random.default_rng(1)
    cap = 640
    feats, coords, valid = _make(rng, 500, 8, cap)
    st = sc.SparseTensor(feats, coords, valid, SHAPE)
    nbr = sc.subm_neighbor_table(st)
    w = jnp.asarray(rng.normal(size=(27, 8, 8)).astype(np.float32))

    # W=8 is far too narrow -> plan must flag overflow and take the exact
    # XLA path (bitwise-identical to the oracle)
    plan = scb.make_banded_plan(nbr, valid, T=128, W=8)
    assert bool(plan.ovf)
    out = scb.banded_subm_conv(128, 8, True, feats, w, valid, nbr, plan)
    ref = sc.gathered_matmul(feats, nbr, w.reshape(27 * 8, 8), valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=0)


def test_banded_vjp_matches_gather_grads():
    rng = np.random.default_rng(2)
    cap = 384
    c = cout = 8
    feats, coords, valid = _make(rng, 300, c, cap)
    st = sc.SparseTensor(feats, coords, valid, SHAPE)
    nbr = sc.subm_neighbor_table(st)
    w = jnp.asarray(rng.normal(size=(27, c, cout)).astype(np.float32) * 0.2)
    plan = scb.make_banded_plan(nbr, valid, T=128, W=512)
    dy = jnp.asarray(rng.normal(size=(cap, cout)).astype(np.float32))

    def loss_banded(f, ww):
        out = scb.banded_subm_conv(128, 512, True, f, ww, valid, nbr, plan)
        return jnp.sum(out * dy)

    def loss_ref(f, ww):
        out = sc.gathered_matmul(f, nbr, ww.reshape(27 * c, cout), valid)
        return jnp.sum(jnp.where(valid[:, None], out, 0.0) * dy)

    gb_f, gb_w = jax.grad(loss_banded, argnums=(0, 1))(feats, w)
    gr_f, gr_w = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    for gb, gr in [(gb_f, gr_f), (gb_w, gr_w)]:
        gb, gr = np.asarray(gb), np.asarray(gr)
        scale = np.abs(gr).max() + 1e-6
        assert np.abs(gb - gr).max() / scale < 2e-2
