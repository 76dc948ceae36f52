"""Conv+BN folding preserves the inference function."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from deepinteraction_tpu.models.layers import ConvBNReLU
from deepinteraction_tpu.utils.fuse_bn import fuse_conv_bn


def test_fold_matches_unfused():
    m = ConvBNReLU(8, 3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 4))
    variables = m.init(jax.random.PRNGKey(1), x, False)
    # give BN non-trivial statistics
    bs = jax.tree_util.tree_map(lambda a: a, variables["batch_stats"])
    bs = {
        "bn": {
            "mean": jnp.asarray(np.random.default_rng(0).normal(size=(8,)), jnp.float32),
            "var": jnp.asarray(np.random.default_rng(1).uniform(0.5, 2.0, size=(8,)), jnp.float32),
        }
    }
    params = variables["params"]
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.random.default_rng(2).normal(size=a.shape), a.dtype), params
    )
    ref = m.apply({"params": params, "batch_stats": bs}, x, False)

    fp, fs, n = fuse_conv_bn(params, bs)
    assert n == 1
    out = m.apply({"params": fp, "batch_stats": fs}, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
