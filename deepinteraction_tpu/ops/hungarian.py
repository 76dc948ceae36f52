"""Hungarian (linear sum assignment) for the set-prediction matcher.

The reference detaches the cost matrix to CPU and calls scipy per sample per
layer (core/bbox/assigners/hungarian_assigner.py:134-140). Here the whole
loss stays jitted and the LAP escapes through one batched
``jax.pure_callback`` with static [L, P, G] shapes — train-only, overlappable
with device compute, and bit-identical to the reference's scipy result.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _lap_host(cost: np.ndarray, num_gt: np.ndarray) -> np.ndarray:
    """Host side. cost [..., P, G]; num_gt [...] valid-column counts.

    Returns assignment [..., P] with col index or -1.
    """
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost)
    num_gt = np.asarray(num_gt)
    lead = cost.shape[:-2]
    p, g = cost.shape[-2], cost.shape[-1]
    out = np.full(lead + (p,), -1, np.int32)
    for idx in np.ndindex(*lead) if lead else [()]:
        ng = int(num_gt[idx]) if lead else int(num_gt)
        if ng <= 0:
            continue
        c = cost[idx][:, :ng]
        rows, cols = linear_sum_assignment(c)
        out[idx + (rows,)] = cols.astype(np.int32)
    return out


def hungarian_assign(cost: jnp.ndarray, num_gt: jnp.ndarray) -> jnp.ndarray:
    """Solve LAP(s) on host via pure_callback.

    Args:
        cost: [..., P, G] float cost (padded columns are ignored).
        num_gt: [...] int32 number of valid columns.
    Returns:
        [..., P] int32 matched column per row, -1 if unmatched.
    """
    lead = cost.shape[:-2]
    out_shape = jax.ShapeDtypeStruct(lead + (cost.shape[-2],), jnp.int32)
    return jax.pure_callback(
        _lap_host, out_shape, cost.astype(jnp.float32), num_gt, vmap_method="sequential"
    )
