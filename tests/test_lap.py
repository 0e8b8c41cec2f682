"""Assignment-solver parity vs the exact scipy Hungarian oracle."""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from richsem_tpu.ops.lap import (
    auction_assignment,
    batched_min_cost_assignment,
    greedy_assignment,
    scipy_assignment,
)


def _opt_cost(cost, rows_valid=None):
    if rows_valid is not None:
        cost = cost[rows_valid]
    r, c = linear_sum_assignment(cost)
    return cost[r, c].sum()


def test_matches_scipy_optimal_cost(rng):
    """Auction total cost equals scipy's optimum on DETR-scale matrices."""
    for trial in range(5):
        p, o = 13, 40
        cost = rng.standard_normal((p, o)).astype(np.float32) * 4.0
        valid = np.ones(p, bool)
        obj_of, _ = auction_assignment(jnp.asarray(-cost), jnp.asarray(valid))
        obj_of = np.asarray(obj_of)
        assert len(set(obj_of.tolist())) == p, "assignment must be one-to-one"
        got = cost[np.arange(p), obj_of].sum()
        want = _opt_cost(cost)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_exact_on_integer_costs(rng):
    """With well-separated costs the argmax assignment is exactly scipy's."""
    for trial in range(3):
        p, o = 8, 20
        cost = rng.integers(0, 50, (p, o)).astype(np.float32)
        cost += rng.uniform(0, 1e-3, (p, o))  # break ties deterministically
        obj_of, _ = auction_assignment(jnp.asarray(-cost), jnp.ones(p, bool))
        r, c = linear_sum_assignment(cost)
        got = cost[np.arange(p), np.asarray(obj_of)].sum()
        np.testing.assert_allclose(got, cost[r, c].sum(), rtol=1e-5)


def test_padded_persons_ignored(rng):
    p, o = 10, 16
    cost = rng.standard_normal((p, o)).astype(np.float32)
    valid = np.zeros(p, bool)
    valid[:4] = True
    obj_of, _ = auction_assignment(jnp.asarray(-cost), jnp.asarray(valid))
    obj_of = np.asarray(obj_of)
    assert (obj_of[4:] == -1).all()
    assert (obj_of[:4] >= 0).all()
    got = cost[np.arange(4), obj_of[:4]].sum()
    np.testing.assert_allclose(got, _opt_cost(cost, valid), rtol=1e-4, atol=1e-4)


def test_no_valid_persons(rng):
    cost = rng.standard_normal((5, 8)).astype(np.float32)
    obj_of, realized = auction_assignment(jnp.asarray(-cost), jnp.zeros(5, bool))
    assert (np.asarray(obj_of) == -1).all()
    np.testing.assert_allclose(np.asarray(realized), 0.0)


def test_batched_matches_scipy(rng):
    b, p, o = 4, 12, 30
    cost = rng.standard_normal((b, p, o)).astype(np.float32)
    valid = rng.uniform(size=(b, p)) > 0.3
    got = np.asarray(
        batched_min_cost_assignment(jnp.asarray(cost), jnp.asarray(valid))
    )
    want = scipy_assignment(cost, valid)
    for bi in range(b):
        rows = np.nonzero(valid[bi])[0]
        got_cost = cost[bi, rows, got[bi, rows]].sum()
        want_cost = cost[bi, rows, want[bi, rows]].sum()
        np.testing.assert_allclose(got_cost, want_cost, rtol=1e-4, atol=1e-4)
        assert (got[bi, ~valid[bi]] == -1).all()


def test_detr_scale_shapes(rng):
    """900 queries × 300 padded gt slots — the production shape."""
    p, o = 300, 900
    cost = rng.standard_normal((p, o)).astype(np.float32)
    valid = np.zeros(p, bool)
    valid[:25] = True  # typical LVIS image
    obj_of, _ = auction_assignment(jnp.asarray(-cost), jnp.asarray(valid))
    obj_of = np.asarray(obj_of)
    assigned = obj_of[:25]
    assert len(set(assigned.tolist())) == 25
    got = cost[np.arange(25), assigned].sum()
    np.testing.assert_allclose(got, _opt_cost(cost, valid), rtol=1e-3, atol=1e-3)


def test_greedy_assignment(rng):
    cost = np.array([[1.0, 0.1, 2.0], [0.5, 3.0, 0.2]], np.float32)[None]
    valid = np.array([[True, False]])
    out = np.asarray(greedy_assignment(jnp.asarray(cost), jnp.asarray(valid)))
    assert out[0, 0] == 1 and out[0, 1] == -1


def test_iteration_cap_fallback(rng):
    """All-tied benefits + tiny iteration cap: every valid person still gets
    an object (greedy fallback), preferring one-to-one."""
    p, o = 20, 60
    cost = np.zeros((p, o), np.float32)  # fully degenerate ties
    valid = np.ones(p, bool)
    obj_of, _ = auction_assignment(
        jnp.asarray(-cost), jnp.asarray(valid), max_iters=3
    )
    obj_of = np.asarray(obj_of)
    assert (obj_of >= 0).all()


def test_price_war_tied_rows(rng):
    """Near-identical rows (co-located GT boxes) trigger price wars that a
    fixed-small-ε auction cannot finish inside its iteration cap; the
    restart-coarser escalation must still land within the ε bound of the
    scipy optimum (not greedy-fallback quality)."""
    p, o = 40, 200
    base = rng.standard_normal((1, o)).astype(np.float32)
    cost = np.tile(base, (p, 1)) + 1e-5 * rng.standard_normal((p, o)).astype(
        np.float32
    )
    valid = np.ones(p, bool)
    obj_of, _ = auction_assignment(jnp.asarray(-cost), jnp.asarray(valid))
    obj_of = np.asarray(obj_of)
    assert len(set(obj_of.tolist())) == p  # one-to-one
    got = cost[np.arange(p), obj_of].sum()
    opt = _opt_cost(cost, valid)
    # coarsest-attempt ε bound: P · ε_rel·64² · scale — loose but far
    # tighter than what greedy fallback achieves on tied rows
    assert got - opt < 0.05 * abs(opt) + 0.5
