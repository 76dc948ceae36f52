"""k×k local (sliding-window) attention primitives.

TPU-native rebuild of the reference's in-repo CUDA extension
(models/utils/ops/locatt_ops/: ``similar_forward`` = per-pixel dot of the
query with its k² neighborhood of keys, ``weighting_forward`` = per-pixel
weighted sum of the k² neighborhood of values; kernels.cuh:5-119).

Boundary semantics reproduced exactly: the CUDA kernel writes logit 0 (not
-inf) for out-of-window taps (kernels.cuh:30-39) and skips those taps when
weighting (kernels.cuh:70-77). Zero-padding the key/value maps reproduces
both bit-for-bit: a zero key gives a zero logit; a zero value contributes
nothing.

Implementation: statically unrolled shifted slices of a zero-padded map —
XLA fuses each (slice, multiply, reduce) without materializing k² copies.
Autodiff works through pad/slice, so no custom VJP is needed for this
formulation (the CUDA original hand-writes 4 backward kernels,
similar.cu / weighting.cu). Layout is NHWC (TPU-friendly; last dim = lanes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def local_similar(query: jnp.ndarray, key: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """Per-pixel q·k over a kernel×kernel neighborhood.

    Args:
        query, key: [B, H, W, C].
    Returns:
        logits [B, H, W, kernel*kernel].
    """
    b, h, w, c = query.shape
    r = kernel // 2
    kp = jnp.pad(key, ((0, 0), (r, r), (r, r), (0, 0)))
    outs = []
    for dh in range(kernel):
        for dw in range(kernel):
            shifted = kp[:, dh : dh + h, dw : dw + w, :]
            outs.append(jnp.sum(query * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)


def local_weighting(value: jnp.ndarray, weight: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """Per-pixel weighted sum of the kernel×kernel neighborhood of values.

    Args:
        value: [B, H, W, C]; weight: [B, H, W, kernel*kernel].
    Returns:
        [B, H, W, C].
    """
    b, h, w, c = value.shape
    r = kernel // 2
    vp = jnp.pad(value, ((0, 0), (r, r), (r, r), (0, 0)))
    out = jnp.zeros_like(value)
    k = 0
    for dh in range(kernel):
        for dw in range(kernel):
            out = out + weight[..., k : k + 1] * vp[:, dh : dh + h, dw : dw + w, :]
            k += 1
    return out


def local_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    kernel: int,
) -> jnp.ndarray:
    """softmax(similar(q, k) / sqrt(C)) then weighting — the full block math
    of the reference's ``LocalContextAttentionBlock.forward``
    (encoder_utils.py:127-135). Projections are the caller's job.
    """
    c = key.shape[-1]
    logits = local_similar(query, key, kernel).astype(jnp.float32)
    attn = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(c)), axis=-1)
    return local_weighting(value, attn.astype(value.dtype), kernel)
