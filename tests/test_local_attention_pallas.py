"""Fused Pallas local attention vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinteraction_tpu.ops.local_attention import local_attention
from deepinteraction_tpu.ops.local_attention_pallas import local_attention_fused


@pytest.mark.parametrize("shape,kernel", [((2, 16, 24, 128), 5), ((1, 11, 13, 128), 3)])
@pytest.mark.parametrize("mxu_dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_oracle(shape, kernel, mxu_dtype, monkeypatch):
    import deepinteraction_tpu.ops.local_attention_pallas as lap

    monkeypatch.setattr(lap, "_MXU_DTYPE", mxu_dtype)
    lap._pallas_forward.clear_cache()
    rng = jax.random.PRNGKey(0)
    kq, kk_, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk_, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    ref = local_attention(q, k, v, kernel)
    out = local_attention_fused(q, k, v, kernel)
    tol = 2e-5 if mxu_dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=tol, rtol=tol)
    lap._pallas_forward.clear_cache()


def test_fused_gradients_match_oracle(monkeypatch):
    import deepinteraction_tpu.ops.local_attention_pallas as lap

    monkeypatch.setattr(lap, "_MXU_DTYPE", jnp.float32)
    lap._pallas_forward.clear_cache()
    rng = jax.random.PRNGKey(1)
    kq, kk_, kv = jax.random.split(rng, 3)
    shape = (1, 8, 16, 128)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk_, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(local_attention_fused(q, k, v, 3) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(local_attention(q, k, v, 3) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)
    lap._pallas_forward.clear_cache()
