"""Swin stochastic depth + dropout (reference swin.py:283-458; the ++ config
trains with drop_path_rate=0.2, Fusion_0075_plusplus.py:157-159)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepinteraction_tpu.models.layers import DropPath
from deepinteraction_tpu.models.swin import SwinTransformer


def test_drop_path_semantics():
    x = jnp.ones((512, 4))
    mod = DropPath(0.25)
    v = mod.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, True)
    # eval: exact identity
    np.testing.assert_array_equal(np.asarray(mod.apply(v, x, False)), np.ones((512, 4)))
    # train: each sample's branch is either dropped or scaled by 1/keep
    out = np.asarray(mod.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(2)}))
    per_sample = out[:, 0]
    assert set(np.round(np.unique(per_sample), 5)) <= {0.0, np.float32(np.round(1 / 0.75, 5))}
    # rows are dropped or kept atomically
    assert (np.ptp(out, axis=1) == 0).all()
    # unbiased in expectation
    assert abs(out.mean() - 1.0) < 0.1


def test_swin_drop_path_eval_identity_train_stochastic():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 28, 28, 3)).astype(np.float32))
    reg = SwinTransformer(embed_dims=24, depths=(1, 1), num_heads=(2, 2),
                          window_size=7, out_indices=(0, 1), drop_path_rate=0.5)
    plain = SwinTransformer(embed_dims=24, depths=(1, 1), num_heads=(2, 2),
                            window_size=7, out_indices=(0, 1))
    v = reg.init({"params": jax.random.PRNGKey(0)}, x, False)
    # eval: drop-path/dropout are identity -> same outputs as rate-0 model
    o_reg = reg.apply(v, x, False)
    o_plain = plain.apply(v, x, False)
    for a, b in zip(o_reg, o_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
    # train: stochastic (differs from eval), and finite
    o_tr = reg.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(o_tr[1]), np.asarray(o_reg[1]))
    assert np.isfinite(np.asarray(o_tr[1])).all()
