"""Banded one-hot gather-matmul submanifold conv (Pallas TPU kernel).

The generic XLA row-gather in ``sparse_conv.gathered_matmul`` is
row-count-bound (~3 ns/row on v5e regardless of row width), which makes the
27-tap sparse middle encoder gather-dominated (PERF.md). This kernel removes
the gather entirely by exploiting a structural property of the sorted COO
layout: for a fixed kernel tap, neighbor row indices are monotone in the
output row (both sides sorted by linear id), so each output tile's neighbors
live in a *contiguous window* of the feature table.

Scatter form (one pass, grid over input tiles):

    out[nbr[j, d]] += feat[j] @ W[mirror(d)]      (injective per tap)

- input feature tiles stream through VMEM (plain blocked DMA, no
  data-dependent addressing on the input side);
- the output accumulator stays resident in VMEM across all grid steps;
- each tap's contribution lands in a per-(tile, x-group) window
  ``out[start : start+W]`` via a transposed one-hot matmul on the MXU:
  ``contrib = onehot(local)ᵀ @ (feat_tile @ W_d)``;
- the 3 x-taps of each (dz,dy) pair share one window and one
  read-modify-write (their linear ids differ by ±1).

Exactness: window width ``W`` must cover each (tile, group)'s index spread.
The plan computes an overflow flag; on overflow the conv falls back to the
exact XLA gather path under ``lax.cond`` (both compiled, one executed), so
results are always correct for any point distribution. Matmuls run in
bfloat16 with fp32 accumulation (feature rounding ~1e-3 rel; the reference's
CUDA spconv also computes in reduced tf32/fp16 modes on modern GPUs).

Backward: d/dfeat is the same banded kernel with weights ``W'[d] =
W[mirror(d)]ᵀ`` (submanifold conv's transpose is itself a submanifold conv
over the same neighbor table); d/dW is one XLA gather + contraction.

Replaces: spconv SubMConv3d used by mmdet3d SparseEncoder (reference config
Fusion_0075_refactor.py:160-168, consumed at deepinteraction.py:127).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import sparse_conv as sc

D = 27  # 3x3x3 taps, row-major (dz, dy, dx); x fastest
DP = 32  # tap rows padded to a sublane multiple
# mirror(d): tap (dz,dy,dx) -> (2-dz, 2-dy, 2-dx)
MIRROR = np.array([26 - d for d in range(D)], np.int32)
INT_MAX = np.iinfo(np.int32).max


def _rup(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class BandedPlan(NamedTuple):
    """Per-stage banding of a [K, 27] neighbor table (shared by every conv
    in the stage — the active set does not change between submanifold
    convs)."""

    starts: jnp.ndarray  # [nt, 9] int32, 8-aligned window starts
    localT: jnp.ndarray  # [nt*DP, T] int32, tap-major local offsets (-1 miss)
    ovf: jnp.ndarray  # [] bool — any local offset >= W


def make_banded_plan(
    nbr: jnp.ndarray, valid: jnp.ndarray, *, T: int = 128, W: int = 512
) -> BandedPlan:
    """Band a submanifold neighbor table for tile size T and window W."""
    K = nbr.shape[0]
    nt = -(-K // T)
    Kp = nt * T
    rout = _rup(Kp + 1 + W, 512)
    nbrp = jnp.full((Kp, D), K, jnp.int32).at[:K].set(
        jnp.where(valid[:, None], nbr, K)
    )
    miss = nbrp == K
    big = jnp.where(miss, INT_MAX, nbrp).reshape(nt, T, 9, 3)
    starts = jnp.min(big, axis=(1, 3))  # [nt, 9]
    starts = jnp.where(starts == INT_MAX, 0, starts)
    starts = jnp.clip(starts & ~7, 0, rout - W).astype(jnp.int32)
    local = nbrp.reshape(nt, T, 9, 3) - starts[:, None, :, None]
    local = jnp.where(miss.reshape(nt, T, 9, 3), -1, local)
    ovf = jnp.any(local >= W)
    localT = jnp.full((nt, DP, T), -1, jnp.int32).at[:, :D].set(
        jnp.transpose(local.reshape(nt, T, D), (0, 2, 1))
    )
    return BandedPlan(starts, localT.reshape(nt * DP, T), ovf)


def _banded_kernel_call(featp, starts, localT, w_flat, *, T, W, rout, interpret):
    """pallas_call wrapper. featp [Kp, C] bf16 (invalid rows zeroed),
    w_flat [C, 27*Cout] bf16 already in scatter (mirrored) tap order."""
    Kp, C = featp.shape
    cout = w_flat.shape[1] // D
    nt = Kp // T

    def kernel(starts_ref, feat_ref, localT_ref, w_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        fw = jax.lax.dot_general(
            feat_ref[:],
            w_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # [T, 27*Cout]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)

        for g in range(9):
            contrib = None
            for dx in range(3):
                d = g * 3 + dx
                lrow = localT_ref[d, :]  # [T]
                oh = (
                    iota_w == jnp.broadcast_to(lrow[None, :], (W, T))
                ).astype(jnp.bfloat16)
                c = jax.lax.dot_general(
                    oh,
                    fw[:, d * cout : (d + 1) * cout],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [W, Cout]
                contrib = c if contrib is None else contrib + c
            start = pl.multiple_of(starts_ref[t, g], 8)
            out_ref[pl.ds(start, W), :] += contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((T, C), lambda t, s: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DP, T), lambda t, s: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (C, D * cout), lambda t, s: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (rout, cout), lambda t, s: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rout, cout), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(starts, featp, localT, w_flat)


def _banded_apply(features, weights, valid, nbr, plan, *, T, W, interpret):
    """Linear map out = SubMConv(features; weights), banded fast path with
    exact XLA fallback on window overflow. weights [27, Cin, Cout] in
    GATHER tap order (out[i] += feat[nbr[i, d]] @ weights[d])."""
    K, C = features.shape
    cout = weights.shape[-1]
    nt = -(-K // T)
    Kp = nt * T
    rout = _rup(Kp + 1 + W, 512)

    featp = jnp.zeros((Kp, C), jnp.bfloat16).at[:K].set(
        jnp.where(valid[:, None], features, 0.0).astype(jnp.bfloat16)
    )
    # scatter order: tap d scatters along nbr[:, d] with weights[mirror(d)]
    w_flat = jnp.transpose(
        weights[MIRROR].astype(jnp.bfloat16), (1, 0, 2)
    ).reshape(C, D * cout)

    def fast_path(_):
        out = _banded_kernel_call(
            featp, plan.starts, plan.localT, w_flat,
            T=T, W=W, rout=rout, interpret=interpret,
        )
        return out[:K]

    def slow_path(_):
        return sc.gathered_matmul(
            features, nbr, weights.reshape(D * C, cout), valid
        )

    out = jax.lax.cond(plan.ovf, slow_path, fast_path, None)
    return jnp.where(valid[:, None], out, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def banded_subm_conv(T, W, interpret, features, weights, valid, nbr, plan):
    """Submanifold 3x3x3 sparse conv over a banded plan.

    features [K, Cin] fp32; weights [27, Cin, Cout] (gather tap order);
    valid [K] bool; nbr [K, 27] int32 (K = miss); plan = make_banded_plan.
    Returns [K, Cout] fp32 (bf16 matmul precision).
    """
    return _banded_apply(
        features, weights, valid, nbr, plan, T=T, W=W, interpret=interpret
    )


def _banded_fwd(T, W, interpret, features, weights, valid, nbr, plan):
    out = _banded_apply(
        features, weights, valid, nbr, plan, T=T, W=W, interpret=interpret
    )
    # bf16 residual halves the per-conv feature copy held across the
    # backward; the fwd matmul already runs in bf16, so dw sees the same
    # rounded activations the primal used.
    return out, (features.astype(jnp.bfloat16), weights, valid, nbr, plan)


def _banded_bwd(T, W, interpret, res, dy):
    features, weights, valid, nbr, plan = res
    features = features.astype(jnp.float32)
    dy = jnp.where(valid[:, None], dy, 0.0)
    # d/dfeat: transpose conv = same banded conv with W'[d] = W[mirror d]^T
    wt = jnp.transpose(weights[MIRROR], (0, 2, 1))  # [27, Cout, Cin]
    dfeat = _banded_apply(
        dy, wt, valid, nbr, plan, T=T, W=W, interpret=interpret
    )
    # d/dW[d] = gathered(features)[:, d, :]^T @ dy. Tap-looped: peak memory
    # [K, Cin] instead of the [K, 27, Cin] einsum materialization (~200 MB
    # per conv at stage-0 size — the old form pushed full-size fwd+bwd
    # train graphs over 16 GB HBM). Same total gather-index count.
    kin, cin = features.shape
    table = jnp.concatenate(
        [jnp.where(valid[:, None], features, 0.0),
         jnp.zeros((1, cin), features.dtype)], axis=0
    )

    def tap(d, acc):
        idx = jnp.minimum(jax.lax.dynamic_index_in_dim(nbr, d, 1, False), kin)
        g = table[idx]  # [K, Cin]
        return acc.at[d].set(
            jax.lax.dot_general(g, dy, (((0,), (0,)), ((), ())))
        )

    dw = jax.lax.fori_loop(
        0, D, tap, jnp.zeros((D, cin, dy.shape[1]), jnp.float32)
    )
    return dfeat, dw.astype(weights.dtype), None, None, None


banded_subm_conv.defvjp(_banded_fwd, _banded_bwd)
