import numpy as np
import pytest

import jax.numpy as jnp

from dtlr_tpu.ops.matcher import auction_assign, hungarian_match, match_cost

scipy_opt = pytest.importorskip("scipy.optimize")


def total_cost(cost, assign, valid):
    c = 0.0
    for j in range(cost.shape[1]):
        if valid[j]:
            assert assign[j] >= 0
            c += cost[assign[j], j]
    return c


@pytest.mark.parametrize("nq,n", [(60, 10), (120, 40), (300, 100)])
def test_auction_near_optimal(nq, n):
    rng = np.random.default_rng(nq + n)
    cost = rng.standard_normal((nq, n)).astype(np.float32) * 3
    valid = np.ones((n,), bool)
    assign = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(valid)))
    # distinct queries
    assert len(set(assign.tolist())) == n
    rows, cols = scipy_opt.linear_sum_assignment(cost)
    opt = cost[rows, cols].sum()
    got = total_cost(cost, assign, valid)
    spread = cost.max() - cost.min()
    assert got <= opt + 0.01 * spread * n / 10 + 1e-4, (got, opt)


def test_auction_with_invalid_targets():
    rng = np.random.default_rng(0)
    nq, n = 50, 12
    cost = rng.standard_normal((nq, n)).astype(np.float32)
    valid = np.zeros((n,), bool)
    valid[:5] = True
    assign = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(valid)))
    assert (assign[5:] == -1).all()
    assert (assign[:5] >= 0).all()
    assert len(set(assign[:5].tolist())) == 5


def test_batched_match_matches_scipy_costs():
    rng = np.random.default_rng(1)
    B, nq, K, N = 3, 40, 7, 9
    logits = rng.standard_normal((B, nq, K)).astype(np.float32)
    pboxes = rng.uniform(0.2, 0.8, (B, nq, 4)).astype(np.float32)
    labels = rng.integers(0, K, (B, N))
    tboxes = rng.uniform(0.2, 0.8, (B, N, 4)).astype(np.float32)
    valid = np.ones((B, N), bool)
    valid[1, 5:] = False

    assign = np.asarray(
        hungarian_match(
            jnp.asarray(logits), jnp.asarray(pboxes),
            jnp.asarray(labels), jnp.asarray(tboxes), jnp.asarray(valid),
        )
    )
    for b in range(B):
        n = valid[b].sum()
        cost = np.asarray(
            match_cost(jnp.asarray(logits[b]), jnp.asarray(pboxes[b]),
                       jnp.asarray(labels[b]), jnp.asarray(tboxes[b]))
        )
        rows, cols = scipy_opt.linear_sum_assignment(cost[:, :n])
        opt = cost[rows, cols].sum()
        got = sum(cost[assign[b, j], j] for j in range(n))
        spread = cost.max() - cost.min()
        assert got <= opt + 0.02 * spread, (b, got, opt)
        assert (assign[b, n:] == -1).all()


def test_scipy_impl_exact():
    rng = np.random.default_rng(2)
    B, nq, K, N = 2, 30, 5, 6
    logits = rng.standard_normal((B, nq, K)).astype(np.float32)
    pboxes = rng.uniform(0.2, 0.8, (B, nq, 4)).astype(np.float32)
    labels = rng.integers(0, K, (B, N))
    tboxes = rng.uniform(0.2, 0.8, (B, N, 4)).astype(np.float32)
    valid = np.ones((B, N), bool)
    assign = np.asarray(
        hungarian_match(
            jnp.asarray(logits), jnp.asarray(pboxes), jnp.asarray(labels),
            jnp.asarray(tboxes), jnp.asarray(valid), impl="scipy",
        )
    )
    for b in range(B):
        cost = np.asarray(
            match_cost(jnp.asarray(logits[b]), jnp.asarray(pboxes[b]),
                       jnp.asarray(labels[b]), jnp.asarray(tboxes[b]))
        )
        rows, cols = scipy_opt.linear_sum_assignment(cost)
        want = np.full((N,), -1, np.int32)
        want[cols] = rows
        np.testing.assert_array_equal(assign[b], want)
