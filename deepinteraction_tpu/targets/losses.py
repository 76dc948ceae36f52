"""Loss functions (mmdet semantics, pure JAX).

Reference losses: FocalLoss (use_sigmoid, γ=2, α=0.25) for per-proposal
classification, GaussianFocalLoss for the dense heatmap, weighted L1 for
boxes (config Fusion_0075_refactor.py:221-223, applied in
deepinteraction_decoder.py:484-547).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clip_sigmoid(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """mmdet3d ``clip_sigmoid``: sigmoid clamped away from {0, 1}."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def sigmoid_focal_loss(
    logits: jnp.ndarray,  # [..., C]
    labels: jnp.ndarray,  # [...] int; label == C means background
    weights: jnp.ndarray,  # [...]
    avg_factor: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    c = logits.shape[-1]
    p = jax.nn.sigmoid(logits)
    onehot = jax.nn.one_hot(labels, c, dtype=logits.dtype)
    pt = jnp.where(onehot > 0, 1.0 - p, p)
    focal = pt**gamma
    alpha_t = jnp.where(onehot > 0, alpha, 1.0 - alpha)
    bce = jnp.where(
        onehot > 0,
        -jnp.log(jnp.clip(p, 1e-12)),
        -jnp.log(jnp.clip(1.0 - p, 1e-12)),
    )
    loss = alpha_t * focal * bce  # [..., C]
    loss = jnp.sum(loss, axis=-1) * weights
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def gaussian_focal_loss(
    pred: jnp.ndarray,  # probabilities in (0, 1)
    target: jnp.ndarray,  # gaussian heatmap with 1.0 at centers
    avg_factor: jnp.ndarray,
    alpha: float = 2.0,
    gamma: float = 4.0,
) -> jnp.ndarray:
    eps = 1e-12
    pos = (target == 1.0).astype(pred.dtype)
    neg = 1.0 - pos
    pos_loss = -jnp.log(pred + eps) * (1.0 - pred) ** alpha * pos
    neg_loss = (
        -jnp.log(1.0 - pred + eps) * pred**alpha * (1.0 - target) ** gamma * neg
    )
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / jnp.maximum(avg_factor, 1.0)


def weighted_l1_loss(
    pred: jnp.ndarray, target: jnp.ndarray, weights: jnp.ndarray, avg_factor: jnp.ndarray
) -> jnp.ndarray:
    return jnp.sum(jnp.abs(pred - target) * weights) / jnp.maximum(avg_factor, 1.0)
