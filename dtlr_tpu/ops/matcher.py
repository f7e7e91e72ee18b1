"""Bipartite matching on device.

The reference escapes to scipy's Hungarian solver on the host, per image
(reference models/dino/matcher.py:90-95) — a device->host sync in the
middle of every training step, 7x per step (main + 5 aux + interm).
On TPU we keep matching on device with a vectorized auction algorithm
(Bertsekas), which is near-optimal (eps-complementary slackness) and
runs as dense (N, nq) vector ops inside the jitted step.

A scipy host-callback variant is kept for exactness tests and CPU runs
(``matcher_impl='scipy'``).

Cost matrix (reference matcher.py:76-90):
    C = 2 * focal_class_cost + 5 * L1_box_cost + 2 * (-GIoU)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.boxes import box_cxcywh_to_xyxy, generalized_box_iou


def match_cost(
    pred_logits: jnp.ndarray,   # (nq, K)
    pred_boxes: jnp.ndarray,    # (nq, 4) cxcywh
    tgt_labels: jnp.ndarray,    # (N,) int32
    tgt_boxes: jnp.ndarray,     # (N, 4)
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    focal_alpha: float = 0.25,
) -> jnp.ndarray:
    """(nq, N) matching cost, single image (reference matcher.py:66-90)."""
    out_prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    gamma = 2.0
    neg = (1 - focal_alpha) * (out_prob ** gamma) * (-jnp.log(1 - out_prob + 1e-8))
    pos = focal_alpha * ((1 - out_prob) ** gamma) * (-jnp.log(out_prob + 1e-8))
    cost_cls = pos[:, tgt_labels] - neg[:, tgt_labels]  # (nq, N)

    cost_l1 = jnp.sum(
        jnp.abs(pred_boxes[:, None, :] - tgt_boxes[None, :, :]), axis=-1
    )
    cost_g = -generalized_box_iou(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )
    return cost_bbox * cost_l1 + cost_class * cost_cls + cost_giou * cost_g


def auction_assign(
    cost: jnp.ndarray,          # (nq, N) fp32
    valid: jnp.ndarray,         # (N,) bool — which targets are real
    eps_rel: float = 1e-3,
    max_iters: int = 256,
) -> jnp.ndarray:
    """Assign each valid target a distinct query minimizing total cost.

    Returns (N,) int32: query index per target, -1 for invalid targets.
    Jacobi (synchronous) single-phase auction. With nq >> N (900 queries
    vs <=256 targets) bid collisions are rare and the auction converges
    in single-digit rounds with relative regret ~1e-5 vs. the exact
    Hungarian optimum (see tests/test_matcher.py). Note eps *scaling*
    (classic for square problems) is deliberately absent: carrying
    inflated prices across phases breaks the asymmetric case because
    forward auctions never lower stale prices.
    """
    nq, N = cost.shape
    benefit = -cost.astype(jnp.float32).T  # (N, nq), maximize
    spread = jnp.maximum(jnp.max(benefit) - jnp.min(benefit), 1e-6)
    eps = eps_rel * spread

    NEG = jnp.float32(-1e15)
    benefit = jnp.where(valid[:, None], benefit, NEG)

    def run_phase(state, eps):
        prices, _ = state
        assigned = jnp.full((N,), -1, jnp.int32)
        owner = jnp.full((nq,), -1, jnp.int32)

        def cond(s):
            it, assigned, owner, prices = s
            return (it < max_iters) & jnp.any((assigned < 0) & valid)

        def body(s):
            it, assigned, owner, prices = s
            unassigned = (assigned < 0) & valid
            values = benefit - prices[None, :]  # (N, nq)
            v_masked = jnp.where(unassigned[:, None], values, NEG)
            top2_v, top2_i = jax.lax.top_k(v_masked, 2)
            v1, i1 = top2_v[:, 0], top2_i[:, 0]
            v2 = top2_v[:, 1]
            bid = prices[i1] + (v1 - v2) + eps  # new price if won

            # tie-break by target index. The perturbation must exceed the
            # fp32 ulp at bid magnitude or tied bidders ALL satisfy the
            # winner test and pile onto one query (found by the
            # identical-columns adversarial test) — scale it by spread.
            order = bid - jnp.arange(N, dtype=jnp.float32) * (spread * 1e-5)
            order = jnp.where(unassigned, order, NEG)
            win_order = jax.ops.segment_max(order, i1, num_segments=nq)  # (nq,)
            is_winner = unassigned & (order >= win_order[i1])

            win_q = jnp.where(is_winner, i1, nq)  # winners' queries
            # evict previous owners of won queries
            won_query_mask = jnp.zeros((nq + 1,), bool).at[win_q].set(True)[:nq]
            evicted_targets = jnp.where(won_query_mask, owner, -1)
            assigned = jnp.where(
                jnp.isin(jnp.arange(N), evicted_targets), -1, assigned
            )
            # record new ownership
            assigned = jnp.where(is_winner, i1, assigned)
            owner = owner.at[win_q].set(
                jnp.where(is_winner, jnp.arange(N, dtype=jnp.int32), -1),
                mode="drop",
            )
            prices = prices.at[win_q].set(jnp.where(is_winner, bid, 0.0), mode="drop")
            return it + 1, assigned, owner, prices

        it, assigned, owner, prices = jax.lax.while_loop(
            cond, body, (jnp.int32(0), assigned, owner, prices)
        )
        return (prices, assigned, owner), None

    prices0 = jnp.zeros((nq,), jnp.float32)
    state = (prices0, jnp.full((N,), -1, jnp.int32))
    (prices, assigned, owner), _ = run_phase(state, eps)

    # consistency: a target only keeps its query if it is the query's
    # recorded owner (belt-and-braces dedup before greedy completion)
    safe_q = jnp.where(assigned >= 0, assigned, 0)
    consistent = (assigned >= 0) & (owner[safe_q] == jnp.arange(N))
    assigned = jnp.where(consistent, assigned, -1)

    # greedy completion: guarantee every valid target ends up with a
    # distinct query even if the iteration cap was hit
    taken = jnp.zeros((nq + 1,), bool).at[jnp.where(assigned >= 0, assigned, nq)].set(True)[:nq]

    def complete(carry, j):
        assigned, taken = carry
        need = valid[j] & (assigned[j] < 0)
        c = jnp.where(taken, jnp.inf, cost[:, j])
        q = jnp.argmin(c).astype(jnp.int32)
        assigned = assigned.at[j].set(jnp.where(need, q, assigned[j]))
        taken = taken.at[q].set(taken[q] | need)
        return (assigned, taken), None

    (assigned, _), _ = jax.lax.scan(complete, (assigned, taken), jnp.arange(N))
    return jnp.where(valid, assigned, -1)


def _scipy_assign_host(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    nq, N = cost.shape
    n = int(n_valid)
    out = np.full((N,), -1, np.int32)
    if n > 0:
        rows, cols = linear_sum_assignment(cost[:, :n])
        out[cols] = rows.astype(np.int32)
    return out


def scipy_assign(cost: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Exact Hungarian via host callback (testing / CPU path).

    Assumes valid targets occupy a contiguous prefix (the batcher always
    packs targets that way, data/batching.py::collate); holes are
    compacted away here so a non-prefix mask still assigns correctly.
    """
    N = cost.shape[1]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # compact valid columns to a prefix: invalid columns get +inf cost
    # and sort to the back (stable), then results scatter back below
    order = jnp.argsort(~valid, stable=True)          # valid first
    cost = jnp.take(cost, order, axis=1)
    inv = jnp.zeros((N,), jnp.int32).at[order].set(jnp.arange(N, dtype=jnp.int32))
    assigned_prefix = jax.pure_callback(
        _scipy_assign_host,
        jax.ShapeDtypeStruct((N,), jnp.int32),
        cost.astype(jnp.float32),
        n_valid,
        vmap_method="sequential",
    )
    return jnp.take(assigned_prefix, inv)


@partial(jax.jit, static_argnames=("impl", "cost_class", "cost_bbox", "cost_giou", "focal_alpha"))
def hungarian_match(
    pred_logits: jnp.ndarray,  # (B, nq, K)
    pred_boxes: jnp.ndarray,   # (B, nq, 4)
    tgt_labels: jnp.ndarray,   # (B, N)
    tgt_boxes: jnp.ndarray,    # (B, N, 4)
    tgt_valid: jnp.ndarray,    # (B, N)
    impl: str = "jax",
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    focal_alpha: float = 0.25,
) -> jnp.ndarray:
    """Batched matching. Returns (B, N) query index per target (-1 invalid)."""

    def per_image(logits, boxes, labels, tboxes, valid):
        cost = match_cost(
            logits, boxes, labels, tboxes,
            cost_class=cost_class, cost_bbox=cost_bbox,
            cost_giou=cost_giou, focal_alpha=focal_alpha,
        )
        # invalid targets get zero cost so they never distort the auction
        cost = jnp.where(valid[None, :], cost, 0.0)
        if impl == "scipy":
            return scipy_assign(cost, valid)
        return auction_assign(cost, valid)

    return jax.vmap(per_image)(pred_logits, pred_boxes, tgt_labels, tgt_boxes, tgt_valid)
