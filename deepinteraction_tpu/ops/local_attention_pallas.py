"""Fused Pallas TPU kernel for k×k local (sliding-window) attention.

The TPU-native equivalent of the reference's in-repo CUDA extension
(models/utils/ops/locatt_ops/: ``similar_forward`` + ``weighting_forward``
and their four hand-written backward kernels, kernels.cuh:5-119). The XLA
formulation (ops/local_attention.py) materializes the [B, H, W, k²] logit
map and makes 2·k² passes over the feature maps in HBM; this kernel is one
pass: logits live only in VMEM/registers via an online softmax
(flash-attention style) over the k² taps.

Halo handling uses only pipelined BlockSpecs — K and V are H-padded by one
full row-tile on each side and passed three times with index maps i, i+1,
i+2, so each grid step sees the row-tile plus both neighbours and slices
the (TH+2r)-row window statically. No manual DMA/semaphores (the axon
runtime crashed on the make_async_copy variant).

Compute formulation (v2): block-dense attention on the MXU. The original
kernel looped the k² taps with VPU dot-products (elementwise multiply +
cross-lane reduce per tap) and measured ~10 ms per [6,112,200,128] call —
~50x off roofline. Instead, every query in the 8-row tile attends to the
FULL (8+2r) x (W+2r) halo key block via two matmuls
(QK^T: [8W, C] x [C, (8+2r)(W+2r)], then attn @ V), with the k²-window
constraint applied as a geometric mask on the logit matrix (two iota
comparisons). 81-tap sliding-window attention becomes ~2x 680 MFLOP MXU
contractions per grid step instead of 81 VPU passes. Matmuls run in bf16
with fp32 accumulation by default (DI_LOCATT_MXU=f32 opts out).

Boundary semantics match the CUDA kernel via zero padding (zero key ->
logit 0 exactly like ``similar`` writes 0 for out-of-window taps; zero
value -> no contribution, like ``weighting`` skips them); the softmax runs
over all k² taps including those zeros, as the reference does — the window
mask keeps exactly the k² tap positions, padded or not.

Backward: custom VJP that re-differentiates the XLA oracle formulation —
numerically identical, paid only at train time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .local_attention import local_attention as _xla_local_attention

TH = 8  # row-tile height (fp32 sublane)

_MXU_DTYPE = (
    jnp.float32
    if __import__("os").environ.get("DI_LOCATT_MXU", "bf16") == "f32"
    else jnp.bfloat16
)


def _kernel(q_ref, k0, k1, k2, v0, v1, v2, out_ref, *, kk, w, c, wwp):
    r = kk // 2
    hw = TH + 2 * r
    # assemble the halo window from the three pipelined row-tiles (static
    # slices, so plain value concatenation — no scratch needed). The width
    # is pre-padded to wwp (multiple of 8) OUTSIDE the kernel so the
    # [hw, wwp, c] -> [hw*wwp, c] merge below is layout-preserving; the
    # padded columns carry zero keys and are excluded by the window mask.
    kwin = jnp.concatenate([k0[0, TH - r :], k1[0], k2[0, :r]], axis=0)
    vwin = jnp.concatenate([v0[0, TH - r :], v1[0], v2[0, :r]], axis=0)

    q = q_ref[0].astype(_MXU_DTYPE)  # [TH, w, c]
    keys = kwin.reshape(hw * wwp, c).astype(_MXU_DTYPE)
    vals = vwin.reshape(hw * wwp, c).astype(_MXU_DTYPE)

    scale = jax.lax.rsqrt(jnp.float32(c))
    logits = (
        jax.lax.dot_general(
            q, keys, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # [TH, w, hw*wwp]

    # geometric window mask: query (qy, qx) keeps key (ky, kx) iff the key
    # lies in its k x k window; in halo coordinates that is
    # ky - qy ∈ [0, 2r] and kx - qx ∈ [0, 2r] (padded kx > w-1+2r never
    # passes, so the zero-key pad columns drop out automatically)
    shp = (TH, w, hw * wwp)
    qy = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
    qx = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
    ki = jax.lax.broadcasted_iota(jnp.int32, shp, 2)
    dy = ki // wwp - qy
    dx = ki % wwp - qx
    keep = (dy >= 0) & (dy <= 2 * r) & (dx >= 0) & (dx <= 2 * r)
    logits = jnp.where(keep, logits, -jnp.inf)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    den = jnp.sum(p, axis=-1, keepdims=True)
    attn = (p / den).astype(_MXU_DTYPE)
    out = jax.lax.dot_general(
        attn, vals, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def _pallas_forward(q, k, v, kernel: int, interpret: bool = False):
    b, h, w, c = q.shape
    r = kernel // 2
    assert r <= TH, f"kernel {kernel} halo exceeds one row-tile"
    hp = pl.cdiv(h, TH) * TH
    wwp = pl.cdiv(w + 2 * r, 8) * 8  # key width padded for aligned reshape
    qp = jnp.pad(q.astype(jnp.float32), ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    # K/V: one full row-tile of zero padding above and below (+ the W halo)
    pad_kv = ((0, 0), (TH, TH + hp - h), (r, wwp - w - r), (0, 0))
    kp = jnp.pad(k.astype(jnp.float32), pad_kv)
    vp = jnp.pad(v.astype(jnp.float32), pad_kv)

    kv_spec = lambda off: pl.BlockSpec(
        (1, TH, wwp, c),
        lambda bi, hi, off=off: (bi, hi + off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, kk=kernel, w=w, c=c, wwp=wwp),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, c), q.dtype),
        grid=(b, hp // TH),
        in_specs=[
            pl.BlockSpec(
                (1, TH, w, c), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
            ),
            kv_spec(0),
            kv_spec(1),
            kv_spec(2),
            kv_spec(0),
            kv_spec(1),
            kv_spec(2),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, w, c), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
        ),
        # 6 pipelined kv blocks + the [TH*w, (TH+2r)(w+2r)] fp32 logit
        # matrix (~21 MB at W=200) exceed the default 16M scoped budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(qp, kp, kp, kp, vp, vp, vp)
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


_USE_PALLAS = __import__("os").environ.get("DI_PALLAS_LOCATT", "1") == "1"
# Opt the Pallas kernel back INTO training graphs (bisection / other
# runtimes): the default keeps it out of train because it reproducibly
# crashed the axon TPU worker there (tools/repro/locatt_train_crash.py).
_FORCE_TRAIN = (
    __import__("os").environ.get("DI_PALLAS_LOCATT_TRAIN", "0") == "1"
)


def local_attention_auto(q, k, v, kernel: int, train: bool = False):
    """Fused Pallas kernel on TPU for EVAL graphs (measured ~3x over the
    XLA formulation at model sizes), XLA elsewhere.

    Training graphs use the XLA formulation even on TPU: embedding this
    kernel in the full-size fusion_base train program reproducibly crashed
    the axon TPU worker (eval programs with the identical kernel at the
    identical shapes run fine; bisected via DI_PALLAS_LOCATT /
    DI_SPARSE_IMPL, PERF.md round 2; staged minimal repro:
    tools/repro/locatt_train_crash.py). ``DI_PALLAS_LOCATT_TRAIN=1``
    opts back in. The backward was already routed through the XLA
    oracle, so train-time numerics are unchanged either way.
    """
    if (
        _USE_PALLAS
        and (not train or _FORCE_TRAIN)
        and any(d.platform == "tpu" for d in jax.devices())
    ):
        return local_attention_fused(q, k, v, kernel)
    return _xla_local_attention(q, k, v, kernel)
