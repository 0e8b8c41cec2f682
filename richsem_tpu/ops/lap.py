"""Batched linear assignment on device (auction algorithm).

The reference solves its Hungarian matching with a **per-image scipy
``linear_sum_assignment`` on CPU** (models/richsem/matcher.py:73-78), forcing
a device→host sync per output set (7 per train step — SURVEY.md hot loop #3).
Here the assignment runs *inside* jit as a Bertsekas auction with ε-scaling:

  * persons = ground-truth boxes (few, padded to a static ``max_gt`` with a
    validity mask), objects = queries (900);
  * every unassigned person bids for its best object simultaneously
    (Jacobi/parallel auction); conflicts resolve by a scatter-max on bids;
  * a single run from zero prices with a small ε gives an assignment within
    ``n_persons · ε`` of the optimum. Because queries outnumber ground-truths
    3–30×, bidding conflicts are rare and the loop converges in a handful of
    iterations; with DETR-style float cost matrices the result is empirically
    the scipy-optimal assignment (asserted against scipy in tests/test_lap.py);
  * **price wars** (dense near-tied costs — e.g. many co-located GT boxes at
    high valid-GT density) make a fixed-ε loop crawl: each exchange between
    two persons tied on the same object moves its price by only ~ε, so a tie
    of depth Δ costs Δ/ε iterations. Each auction *attempt* is therefore
    capped at ``4·P + 64`` iterations (generous for the conflict-free
    regime); if the cap trips, the auction RESTARTS from zero prices with ε
    coarsened ×64. Classic warm-price ε-scaling (high→low ε, prices kept)
    is deliberately NOT used: in the asymmetric O ≫ P case stale prices on
    since-abandoned objects break the n·ε duality bound — measured on
    tied-row matrices it converges to assignments ~25% worse than optimal.
    Restart-coarser keeps each attempt's clean zero-price P·ε bound at its
    own ε (near-tied options are ε-interchangeable for matching quality)
    and bounds total work by O(P·log(Δ/ε)) instead of Δ/ε
    (tests/test_lap.py covers the war regime against scipy).

Everything is static-shaped and vectorized: the bidding loop is a
``lax.while_loop`` whose body is O(P·O) dense VPU work; batches vmap.
The body is deliberately **scatter-free** — conflict resolution (per-object
max bid, lowest-index winner) is computed with dense masked reductions over
the ``[P, O]`` plane instead of ``.at[].max/.min`` scatters, which lower to
XLA:TPU's slow scatter path (measured 4.3× end-to-end on captured
production cost matrices, bit-identical assignments).

``scipy_assignment`` (host callback) is kept as the correctness oracle,
mirroring the reference's role for scipy.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("max_iters", "eps_rel"))
def auction_assignment(
    benefit: jnp.ndarray,
    person_valid: jnp.ndarray,
    max_iters: int = 3000,
    eps_rel: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Maximize ``sum(benefit[p, obj_of[p]])`` over one-to-one assignments.

    Args:
      benefit: ``[P, O]`` float matrix (use ``-cost`` to minimize). ``O >= P``
        effective persons.
      person_valid: ``[P]`` bool; invalid (padding) persons never bid and get
        assignment −1.
      max_iters: per-ATTEMPT bidding-iteration cap (each auction attempt runs
        at most ``min(max_iters, 4·P + 64)`` iterations; on a stall the
        auction restarts from zero prices with a ×64 coarser ε, so TOTAL
        while_loop iterations can reach ~``log₆₄(scale/ε_final)`` × the
        per-attempt cap before the greedy fallback engages). Typical
        convergence is a handful of iterations in one attempt.
      eps_rel: bid increment as a fraction of the benefit scale; optimality
        gap is bounded by ``P · eps_rel · scale``.

    Returns:
      ``obj_of_person [P] int32`` (−1 for invalid persons) and the realized
      per-person benefit ``[P] float32`` (0 for invalid).
    """
    p, o = benefit.shape
    benefit = benefit.astype(jnp.float32)
    benefit = jnp.where(person_valid[:, None], benefit, _NEG_INF)
    scale = jnp.maximum(
        jnp.max(jnp.where(person_valid[:, None], jnp.abs(benefit), 0.0)), 1e-6
    )
    person_ids = jnp.arange(p, dtype=jnp.int32)
    obj_ids = jnp.arange(o, dtype=jnp.int32)

    def bidding_step(obj_of, price, eps):
            bidders = person_valid & (obj_of < 0)
            v_masked = jnp.where(
                bidders[:, None], benefit - price[None, :], _NEG_INF
            )
            best_obj = jnp.argmax(v_masked, axis=1)  # [P]
            v1 = jnp.max(v_masked, axis=1)
            best_mask = obj_ids[None, :] == best_obj[:, None]  # [P, O]
            v2 = jnp.max(jnp.where(best_mask, _NEG_INF, v_masked), axis=1)
            bid = jnp.where(
                bidders, price[best_obj] + (v1 - v2) + eps, _NEG_INF
            )  # [P]

            # per-object max bid, then lowest-index winner among max bidders
            # — all dense masked reductions over [P, O]
            bid_mat = jnp.where(
                best_mask & bidders[:, None], bid[:, None], _NEG_INF
            )
            obj_best_bid = jnp.max(bid_mat, axis=0)  # [O]
            contested = obj_best_bid > _NEG_INF / 2  # objects that got a bid
            winner_mat = jnp.where(
                bid_mat >= obj_best_bid[None, :], person_ids[:, None], p
            )
            winner_of_obj = jnp.min(
                jnp.where(contested[None, :], winner_mat, p), axis=0
            )  # [O]

            # evict: person q loses its object if that object was contested
            # and won by someone else (gather-style — no scatter conflicts)
            cur = jnp.clip(obj_of, 0)
            evicted = (
                (obj_of >= 0)
                & contested[cur]
                & (winner_of_obj[cur] != person_ids)
            )
            obj_of = jnp.where(evicted, -1, obj_of)
            # assign: person p wins best_obj[p] if it is that object's winner
            won = (
                bidders
                & contested[best_obj]
                & (winner_of_obj[best_obj] == person_ids)
            )
            obj_of = jnp.where(won, best_obj, obj_of)
            price = jnp.where(contested, obj_best_bid, price)
            return obj_of, price

    eps_final = eps_rel * scale

    # Restart-coarser escalation in ONE while_loop: each attempt is a clean
    # fixed-ε auction from zero prices. If the attempt stalls (price war),
    # prices and assignment reset and ε coarsens ×64: war length scales as
    # Δ/ε, so a handful of restarts bounds TOTAL iterations by
    # O(P·log(Δ/ε)) instead of Δ/ε, while each attempt keeps the clean
    # zero-price P·ε optimality bound at its own ε (near-ties are
    # ε-interchangeable anyway). ε never exceeds the benefit scale — at
    # ε ≈ scale the auction degenerates to (price-free) greedy, which the
    # explicit fallback below covers better.
    #
    # Stall = EITHER of (round-5 attribution: at valid-GT density 150 the
    # old padded-P cap made every war burn 1264 iterations per escalation,
    # 5.00 → 4.04 img/s on the flagship step — the whole density haircut):
    #   * the attempt cap 4·n_valid + 64 — scaled by the number of VALID
    #     persons (the quantity the conflict-free bound depends on), not
    #     the static padding width;
    #   * no NET progress (no new person assigned beyond the attempt's best
    #     so far) for 64 consecutive iterations — in the O ≫ P regime an
    #     iteration either assigns someone new or is a tie exchange, so a
    #     64-iteration progress drought is decisively a war; legitimate
    #     assignment phases never trip it.
    n_valid = person_valid.sum().astype(jnp.int32)
    attempt_cap = jnp.minimum(jnp.int32(max_iters), 4 * n_valid + 64)
    stall_window = jnp.int32(32)
    theta = 64.0

    def is_stalled(it, last_prog):
        return (it >= attempt_cap) | (it - last_prog >= stall_window)

    def cond(state):
        obj_of, _, eps, it, _, last_prog = state
        unassigned = jnp.any(person_valid & (obj_of < 0))
        can_restart = eps <= scale / theta
        return unassigned & (~is_stalled(it, last_prog) | can_restart)

    def body(state):
        obj_of, price, eps, it, best_n, last_prog = state
        restart = is_stalled(it, last_prog)
        eps = jnp.where(restart, eps * theta, eps)
        price = jnp.where(restart, jnp.zeros_like(price), price)
        obj_of = jnp.where(restart, jnp.full_like(obj_of, -1), obj_of)
        it = jnp.where(restart, jnp.int32(0), it)
        best_n = jnp.where(restart, jnp.int32(0), best_n)
        last_prog = jnp.where(restart, jnp.int32(0), last_prog)
        obj_of, price = bidding_step(obj_of, price, eps)
        it = it + 1
        n_now = (person_valid & (obj_of >= 0)).sum().astype(jnp.int32)
        progressed = n_now > best_n
        best_n = jnp.maximum(best_n, n_now)
        last_prog = jnp.where(progressed, it, last_prog)
        return obj_of, price, eps, it, best_n, last_prog

    obj_of0 = jnp.full((p,), -1, dtype=jnp.int32)
    obj_of, price, _, _, _, _ = jax.lax.while_loop(
        cond,
        body,
        (
            obj_of0,
            jnp.zeros((o,), jnp.float32),
            eps_final,
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
        ),
    )

    # Safety fallback: if even the coarsest attempt stalled, assign the
    # stragglers greedily to their best still-free object so no valid
    # person silently stays unmatched.
    unassigned = person_valid & (obj_of < 0)
    taken = jnp.zeros((o,), bool).at[jnp.clip(obj_of, 0)].set(obj_of >= 0)
    fallback_benefit = jnp.where(taken[None, :], _NEG_INF, benefit)
    greedy = jnp.argmax(fallback_benefit, axis=1).astype(jnp.int32)
    obj_of = jnp.where(unassigned, greedy, obj_of)

    realized = jnp.where(
        obj_of >= 0,
        jnp.take_along_axis(
            benefit, jnp.clip(obj_of, 0)[:, None], axis=1
        ).squeeze(1),
        0.0,
    )
    return obj_of, realized


def batched_min_cost_assignment(
    cost: jnp.ndarray, row_valid: jnp.ndarray, **kwargs
) -> jnp.ndarray:
    """Minimize cost over a batch. ``cost [B, P, O]``, ``row_valid [B, P]`` →
    column index per row ``[B, P]`` (−1 where invalid)."""
    fn = lambda c, v: auction_assignment(-c, v, **kwargs)[0]
    return jax.vmap(fn)(cost, row_valid)


def greedy_assignment(cost: jnp.ndarray, row_valid: jnp.ndarray) -> jnp.ndarray:
    """Row-argmin matcher (may collide) — the reference's
    ``SimpleMinsumMatcher`` semantics (models/richsem/matcher.py:81-158)."""
    idx = jnp.argmin(
        jnp.where(row_valid[..., None], cost, jnp.inf), axis=-1
    ).astype(jnp.int32)
    return jnp.where(row_valid, idx, -1)


def scipy_assignment(cost: np.ndarray, row_valid: np.ndarray) -> np.ndarray:
    """Host oracle (exact Hungarian via scipy); batched numpy in/out."""
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost)
    row_valid = np.asarray(row_valid)
    out = np.full(cost.shape[:2], -1, np.int32)
    for b in range(cost.shape[0]):
        rows = np.nonzero(row_valid[b])[0]
        if len(rows) == 0:
            continue
        r, c = linear_sum_assignment(cost[b, rows])
        out[b, rows[r]] = c
    return out


def scipy_assignment_callback(cost: jnp.ndarray, row_valid: jnp.ndarray) -> jnp.ndarray:
    """jit-compatible host-callback wrapper around :func:`scipy_assignment`.

    Inputs are stop_gradient'ed: the assignment is integer (no tangent
    space — same semantics as the auction path), and pure_callback raises
    if it appears on a differentiated path at all (the grad-parity suite
    differentiates the criterion with this matcher pinning assignments)."""
    cost = jax.lax.stop_gradient(cost)
    row_valid = jax.lax.stop_gradient(row_valid)
    shape = jax.ShapeDtypeStruct(cost.shape[:2], jnp.int32)
    return jax.pure_callback(scipy_assignment, shape, cost, row_valid)
