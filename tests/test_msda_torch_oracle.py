"""Independent torch oracle for MSDeformableAttention.

ops/deform_attn.py re-derives mmcv's MultiScaleDeformableAttention for TPU
(gather + bilinear instead of the CUDA kernel). This oracle re-implements
the documented mmcv fallback semantics (multi_scale_deform_attn.py:
``multi_scale_deformable_attn_pytorch``) directly on torch ``F.grid_sample``
— an implementation independent of every jax sampling path in this repo —
and checks the full module output (projections, offset/weight heads, joint
softmax, residual) with shared random weights.

Pinned parity mode (conftest sets DI_MSDA_*_POINTS=0), train=False.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepinteraction_tpu.ops.deform_attn import MSDeformableAttention  # noqa: E402


def _oracle(query, value, ref, shapes, pr, h):
    """mmcv MSDA semantics on torch tensors. pr = flax params (numpy)."""
    q = torch.tensor(query)
    v = torch.tensor(value)
    b, nq, c = q.shape
    hd = c // h
    l = len(shapes)

    vv = v @ torch.tensor(pr["value_proj"]["kernel"]) + torch.tensor(
        pr["value_proj"]["bias"]
    )
    off = q @ torch.tensor(pr["sampling_offsets"]["kernel"]) + torch.tensor(
        pr["sampling_offsets"]["bias"]
    )
    p = off.shape[-1] // (2 * h * l)
    off = off.reshape(b, nq, h, l, p, 2)
    w = q @ torch.tensor(pr["attention_weights"]["kernel"]) + torch.tensor(
        pr["attention_weights"]["bias"]
    )
    w = torch.softmax(w.reshape(b, nq, h, l * p), dim=-1).reshape(b, nq, h, l, p)

    # sampling locations: ref + off / (W_l, H_l)
    normalizer = torch.tensor(
        [[float(ww), float(hh)] for hh, ww in shapes]
    )  # [l, 2] as (x=W, y=H)
    loc = torch.tensor(ref)[:, :, None, :, None, :] + off / normalizer[
        None, None, None, :, None, :
    ]

    sizes = [hh * ww for hh, ww in shapes]
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    out = torch.zeros(b, nq, h, hd, dtype=torch.float64)
    for li, (hh, ww) in enumerate(shapes):
        vl = vv[:, starts[li] : starts[li] + sizes[li]]  # [B, H*W, C]
        vl = (
            vl.reshape(b, hh, ww, h, hd)
            .permute(0, 3, 4, 1, 2)
            .reshape(b * h, hd, hh, ww)
        )
        grid = 2.0 * loc[:, :, :, li] - 1.0  # [B, Nq, h, p, 2]
        grid = grid.permute(0, 2, 1, 3, 4).reshape(b * h, nq, p, 2)
        sampled = F.grid_sample(
            vl.double(),
            grid.double(),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=False,
        )  # [B*h, hd, Nq, p]
        wl = w[:, :, :, li].permute(0, 2, 1, 3).reshape(b * h, 1, nq, p)
        out += (
            (sampled * wl.double())
            .sum(-1)
            .reshape(b, h, hd, nq)
            .permute(0, 3, 1, 2)
        )

    out = out.reshape(b, nq, c).float()
    out = out @ torch.tensor(pr["output_proj"]["kernel"]) + torch.tensor(
        pr["output_proj"]["bias"]
    )
    return (q + out).numpy()


def test_msda_matches_torch_grid_sample_oracle():
    rng = np.random.default_rng(4)
    b, nq, c, h = 2, 7, 32, 4
    shapes = [(6, 9), (3, 5)]
    nv = sum(hh * ww for hh, ww in shapes)

    query = rng.normal(size=(b, nq, c)).astype(np.float32)
    value = rng.normal(size=(b, nv, c)).astype(np.float32)
    ref = rng.uniform(0.08, 0.92, size=(b, nq, len(shapes), 2)).astype(np.float32)

    mod = MSDeformableAttention(c, h, len(shapes), 4, dropout=0.0)
    vars_ = mod.init(
        jax.random.PRNGKey(0),
        jnp.asarray(query),
        jnp.asarray(value),
        jnp.asarray(ref),
        shapes,
    )
    # randomize away from the structured init (zero kernels) so the test
    # exercises real offsets/weights; keep offsets ~ a few pixels
    pr = jax.tree_util.tree_map(
        lambda a: (rng.normal(scale=0.3, size=a.shape)).astype(np.float32),
        jax.device_get(vars_["params"]),
    )

    mine = mod.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, pr)},
        jnp.asarray(query),
        jnp.asarray(value),
        jnp.asarray(ref),
        shapes,
    )
    golden = _oracle(query, value, ref, shapes, pr, h)
    np.testing.assert_allclose(np.asarray(mine), golden, rtol=2e-4, atol=2e-4)


def test_msda_oracle_out_of_bounds_zero_padding():
    """Sampling points pushed off the feature map contribute zeros (mmcv
    padding_mode='zeros') — both implementations must agree there too."""
    rng = np.random.default_rng(11)
    b, nq, c, h = 1, 5, 16, 2
    shapes = [(4, 6)]
    nv = 24
    query = rng.normal(size=(b, nq, c)).astype(np.float32)
    value = rng.normal(size=(b, nv, c)).astype(np.float32)
    # references at the borders; big offsets guarantee out-of-bounds taps
    ref = rng.uniform(-0.2, 1.2, size=(b, nq, 1, 2)).astype(np.float32)

    mod = MSDeformableAttention(c, h, 1, 4, dropout=0.0)
    vars_ = mod.init(
        jax.random.PRNGKey(0),
        jnp.asarray(query),
        jnp.asarray(value),
        jnp.asarray(ref),
        shapes,
    )
    pr = jax.tree_util.tree_map(
        lambda a: (rng.normal(scale=0.5, size=a.shape)).astype(np.float32),
        jax.device_get(vars_["params"]),
    )
    mine = mod.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, pr)},
        jnp.asarray(query),
        jnp.asarray(value),
        jnp.asarray(ref),
        shapes,
    )
    golden = _oracle(query, value, ref, shapes, pr, h)
    np.testing.assert_allclose(np.asarray(mine), golden, rtol=2e-4, atol=2e-4)
