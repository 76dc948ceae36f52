"""Fused Pallas TPU kernel for k×k local (sliding-window) attention.

The TPU-native equivalent of the reference's in-repo CUDA extension
(models/utils/ops/locatt_ops/: ``similar_forward`` + ``weighting_forward``
and their four hand-written backward kernels, kernels.cuh:5-119). The XLA
formulation (ops/local_attention.py) materializes the [B, H, W, k²] logit
map and makes 2·k² passes over the feature maps in HBM; this kernel is one
pass: each grid step DMAs a (TH+2r, W+2r) halo window of K and V into VMEM
and runs an online-softmax (flash-attention style) over the k² taps, so
logits never touch HBM.

Boundary semantics match the CUDA kernel bit-for-bit via zero padding
(zero key -> logit 0 exactly like ``similar`` writes 0 for out-of-window
taps; zero value -> no contribution, like ``weighting`` skips them); the
softmax runs over all k² taps including those zeros, as the reference does.

Backward: custom VJP that re-differentiates the XLA oracle formulation —
numerically identical, paid only at train time. (A fused backward kernel is
a further optimization, not a correctness need.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .local_attention import local_attention as _xla_local_attention

TH = 8  # row-tile height (fp32 sublane)


def _kernel(q_ref, k_hbm, v_hbm, out_ref, k_scr, v_scr, sem_k, sem_v, *, kk, w, c):
    b = pl.program_id(0)
    i = pl.program_id(1)
    r = kk // 2
    ck = pltpu.make_async_copy(
        k_hbm.at[b, pl.ds(i * TH, TH + 2 * r)], k_scr, sem_k
    )
    cv = pltpu.make_async_copy(
        v_hbm.at[b, pl.ds(i * TH, TH + 2 * r)], v_scr, sem_v
    )
    ck.start()
    cv.start()
    ck.wait()
    cv.wait()

    q = q_ref[0]  # [TH, W, C]
    scale = jax.lax.rsqrt(jnp.float32(c))

    def tap(t, carry):
        m, den, acc = carry
        dh = t // kk
        dw = t % kk
        ks = k_scr[pl.ds(dh, TH), pl.ds(dw, w), :]
        vs = v_scr[pl.ds(dh, TH), pl.ds(dw, w), :]
        logit = jnp.sum(q * ks, axis=-1) * scale  # [TH, W]
        m_new = jnp.maximum(m, logit)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logit - m_new)
        den = den * alpha + p
        acc = acc * alpha[..., None] + p[..., None] * vs
        return m_new, den, acc

    m0 = jnp.full((TH, w), -jnp.inf, jnp.float32)
    den0 = jnp.zeros((TH, w), jnp.float32)
    acc0 = jnp.zeros((TH, w, c), jnp.float32)
    _, den, acc = jax.lax.fori_loop(0, kk * kk, tap, (m0, den0, acc0))
    out_ref[0] = (acc / den[..., None]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def _pallas_forward(q, k, v, kernel: int, interpret: bool = False):
    b, h, w, c = q.shape
    r = kernel // 2
    hp = pl.cdiv(h, TH) * TH
    qp = jnp.pad(q.astype(jnp.float32), ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    pad_kv = ((0, 0), (r, r + hp - h), (r, r), (0, 0))
    kp = jnp.pad(k.astype(jnp.float32), pad_kv)
    vp = jnp.pad(v.astype(jnp.float32), pad_kv)

    grid = (b, hp // TH)
    out = pl.pallas_call(
        functools.partial(_kernel, kk=kernel, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, c), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TH, w, c), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, w, c), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * r, w + 2 * r, c), jnp.float32),
            pltpu.VMEM((TH + 2 * r, w + 2 * r, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :h]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def local_attention_fused(q, k, v, kernel: int):
    """Fused local attention; same signature/semantics as
    ops/local_attention.local_attention."""
    interpret = all(d.platform != "tpu" for d in jax.devices())
    return _pallas_forward(q, k, v, kernel, interpret=interpret)


def _fwd(q, k, v, kernel):
    return local_attention_fused(q, k, v, kernel), (q, k, v)


def _bwd(kernel, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_local_attention(a, b, c, kernel), q, k, v)
    return vjp(g)


local_attention_fused.defvjp(_fwd, _bwd)
