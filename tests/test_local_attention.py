import jax.numpy as jnp
import numpy as np

from deepinteraction_tpu.ops.local_attention import (
    local_attention,
    local_similar,
    local_weighting,
)


def _np_similar(q, k, ks):
    """Brute-force oracle mirroring the CUDA cc2k kernel semantics
    (reference kernels.cuh:5-42): zero logit for out-of-bounds taps."""
    b, h, w, c = q.shape
    r = ks // 2
    out = np.zeros((b, h, w, ks * ks), np.float32)
    for bb in range(b):
        for i in range(h):
            for j in range(w):
                for t in range(ks * ks):
                    di, dj = t // ks - r, t % ks - r
                    ii, jj = i + di, j + dj
                    if 0 <= ii < h and 0 <= jj < w:
                        out[bb, i, j, t] = np.dot(q[bb, i, j], k[bb, ii, jj])
    return out


def _np_weighting(v, wgt, ks):
    b, h, w, c = v.shape
    r = ks // 2
    out = np.zeros_like(v)
    for bb in range(b):
        for i in range(h):
            for j in range(w):
                for t in range(ks * ks):
                    di, dj = t // ks - r, t % ks - r
                    ii, jj = i + di, j + dj
                    if 0 <= ii < h and 0 <= jj < w:
                        out[bb, i, j] += wgt[bb, i, j, t] * v[bb, ii, jj]
    return out


def test_local_similar_and_weighting_match_oracle():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 5, 6, 4)).astype(np.float32)
    k = rng.normal(size=(2, 5, 6, 4)).astype(np.float32)
    v = rng.normal(size=(2, 5, 6, 4)).astype(np.float32)
    ks = 3
    sim = np.asarray(local_similar(jnp.asarray(q), jnp.asarray(k), ks))
    np.testing.assert_allclose(sim, _np_similar(q, k, ks), rtol=1e-5, atol=1e-5)

    wgt = rng.normal(size=(2, 5, 6, ks * ks)).astype(np.float32)
    out = np.asarray(local_weighting(jnp.asarray(v), jnp.asarray(wgt), ks))
    np.testing.assert_allclose(out, _np_weighting(v, wgt, ks), rtol=1e-5, atol=1e-5)


def test_local_attention_boundary_keeps_zero_logits():
    # At a corner, out-of-window logits are exactly 0 (not -inf): softmax mass
    # leaks to out-of-bounds taps whose values contribute nothing — the
    # documented CUDA behavior.
    q = np.ones((1, 2, 2, 2), np.float32)
    k = np.ones((1, 2, 2, 2), np.float32)
    v = np.ones((1, 2, 2, 2), np.float32)
    out = np.asarray(local_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 3))
    # corner pixel: 4 in-bounds taps with logit 2/sqrt(2), 5 taps with logit 0
    z = np.exp(2 / np.sqrt(2))
    expect = 4 * z / (4 * z + 5 * np.exp(0.0))
    np.testing.assert_allclose(out[0, 0, 0], [expect, expect], rtol=1e-5)
