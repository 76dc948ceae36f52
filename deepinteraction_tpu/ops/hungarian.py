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


def hungarian_assign(
    cost: jnp.ndarray, num_gt: jnp.ndarray, impl: str = "callback"
) -> jnp.ndarray:
    """Solve LAP(s): scipy on host via pure_callback, or fully on device.

    Args:
        cost: [..., P, G] float cost (padded columns are ignored).
        num_gt: [...] int32 number of valid columns.
        impl: 'callback' (exact, host scipy) or 'auction' (on-device
            epsilon-scaled auction — required on runtimes without host
            callbacks, e.g. the axon TPU tunnel, where pure_callback raises
            UNIMPLEMENTED).
    Returns:
        [..., P] int32 matched column per row, -1 if unmatched.
    """
    if impl == "auction":
        return auction_assign(cost, num_gt)
    lead = cost.shape[:-2]
    out_shape = jax.ShapeDtypeStruct(lead + (cost.shape[-2],), jnp.int32)
    return jax.pure_callback(
        _lap_host, out_shape, cost.astype(jnp.float32), num_gt, vmap_method="sequential"
    )


BIG = 1e9


def default_lap_impl() -> str:
    """'callback' where host callbacks work, else 'auction' (e.g. the axon
    TPU tunnel raises UNIMPLEMENTED for pure_callback)."""
    try:
        out = jax.jit(
            lambda x: jax.pure_callback(
                lambda a: a, jax.ShapeDtypeStruct((), jnp.float32), x
            )
        )(jnp.zeros(()))
        jax.block_until_ready(out)
        return "callback"
    except Exception:
        return "auction"


def auction_assign(
    cost: jnp.ndarray,
    num_gt: jnp.ndarray,
    # a SINGLE small-eps phase measured 10x faster than eps scaling at
    # matching-cost scales (each phase resets assignments and re-churns the
    # dummy columns). The epsilon is RELATIVE: eps = eps_rel * per-problem
    # cost scale, so the (total cost) <= (optimum + eps*G) guarantee holds
    # proportionally at any cost magnitude — a fixed absolute eps was only
    # correct near the tuning scale (uniform(0,10), where 1e-3 relative
    # reproduces the old 0.01 absolute).
    eps_phases: tuple = (1e-3,),
    rounds_per_phase: int = 4096,
) -> jnp.ndarray:
    """Parallel (Jacobi) auction LAP on device (Bertsekas with eps scaling).

    Every unassigned GT column bids for its best proposal row
    simultaneously; each row accepts its highest bidder. One round is a few
    vectorized [P, G] ops, so the whole solver is TPU-shaped (no host
    callback — required on runtimes like the axon tunnel where
    ``pure_callback`` raises UNIMPLEMENTED). With the final epsilon well
    under the cost resolution the assignment matches scipy's optimum on
    matching-style costs (validated in tests).
    """
    lead = cost.shape[:-2]
    p, g_in = cost.shape[-2], cost.shape[-1]
    c = cost.astype(jnp.float32).reshape((-1, p, g_in))
    n = c.shape[0]
    ng = jnp.broadcast_to(jnp.asarray(num_gt, jnp.int32).reshape(-1), (n,))

    # Square the problem: forward auction's eps-optimality guarantee holds
    # for square assignments; rows>cols is handled by constant-benefit dummy
    # columns (their total contribution is a constant, so the real-column
    # assignment stays optimal).
    assert g_in <= p, "auction LAP assumes #GT columns <= #proposal rows"
    g = p
    if g > g_in:
        c = jnp.pad(c, ((0, 0), (0, 0), (0, g - g_in)))
    real_col = jnp.arange(g)[None, :] < ng[:, None]  # [n, g]
    col_ok = jnp.ones_like(real_col)  # dummies bid too
    benefit = jnp.where(real_col[:, None, :], -c, 0.0)  # [n, p, g]
    col_ids = jnp.arange(g)

    def one_problem(bmat, ok, real):
        # per-problem cost scale (dummy columns are zero, so this reads the
        # real-column magnitude); floors at 1e-6 for all-zero costs
        scale = jnp.maximum(jnp.max(jnp.abs(bmat)), 1e-6)

        def phase(carry, eps_rel):
            eps = eps_rel * scale
            _, price = carry
            assign_col = jnp.full((g,), -1, jnp.int32)  # col -> row

            def round_body(state):
                assign_col, price, rounds = state
                unassigned = (assign_col < 0) & ok  # [g]
                vals = bmat - price[:, None]  # [p, g]
                best = jnp.argmax(vals, axis=0)  # [g] best row per col
                top = jnp.max(vals, axis=0)
                masked = jnp.where(
                    jnp.arange(p)[:, None] == best[None, :], -jnp.inf, vals
                )
                second = jnp.max(masked, axis=0)
                second = jnp.where(jnp.isfinite(second), second, top)
                bid = price[best] + (top - second) + eps  # [g]
                bid = jnp.where(unassigned, bid, -jnp.inf)

                # each row accepts its highest bidder
                row_bid = jnp.full((p,), -jnp.inf).at[best].max(
                    jnp.where(unassigned, bid, -jnp.inf), mode="drop"
                )
                # winning col per row: the unassigned col whose (best ==
                # row) and bid == row_bid; break ties by smallest col id
                is_win = (
                    unassigned[None, :]
                    & (best[None, :] == jnp.arange(p)[:, None])
                    & (bid[None, :] == row_bid[:, None])
                )
                win_col = jnp.min(
                    jnp.where(is_win, col_ids[None, :], g), axis=1
                )  # [p], g = no bid
                got_bid = win_col < g

                # displace previous owners of rows that accepted a new bid
                prev_owner_displaced = got_bid[jnp.clip(assign_col, 0, p - 1)] & (
                    assign_col >= 0
                )
                assign_col = jnp.where(prev_owner_displaced, -1, assign_col)
                assign_col = assign_col.at[jnp.where(got_bid, win_col, g)].set(
                    jnp.arange(p, dtype=jnp.int32), mode="drop"
                )
                price = jnp.where(got_bid, row_bid, price)
                return assign_col, price, rounds + 1

            def cond(state):
                assign_col, _, rounds = state
                return jnp.any((assign_col < 0) & ok) & (rounds < rounds_per_phase)

            assign_col, price, _ = jax.lax.while_loop(
                cond, round_body, (assign_col, price, jnp.int32(0))
            )
            return (assign_col, price), None

        (assign_col, _), _ = jax.lax.scan(
            phase,
            (jnp.full((g,), -1, jnp.int32), jnp.zeros((p,))),
            jnp.asarray(eps_phases, jnp.float32),
        )
        # invert col->row into row->col; only real columns count
        owner = jnp.full((p,), -1, jnp.int32)
        rows = jnp.where((assign_col >= 0) & real, assign_col, p)
        owner = owner.at[rows].set(
            jnp.arange(g, dtype=jnp.int32), mode="drop"
        )
        return owner

    owners = jax.vmap(one_problem)(benefit, col_ok, real_col)
    return owners.reshape(lead + (p,))
