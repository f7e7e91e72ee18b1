"""Adversarial auction-matcher cases: ties, identical rows, degenerate
costs — must terminate with a valid assignment and bounded regret."""

import numpy as np
import pytest

import jax.numpy as jnp

from dtlr_tpu.ops.matcher import auction_assign

scipy_opt = pytest.importorskip("scipy.optimize")


def _check(cost, valid):
    assign = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(valid)))
    n = valid.sum()
    chosen = assign[:n]
    assert (chosen >= 0).all()
    assert len(set(chosen.tolist())) == n  # distinct queries
    rows, cols = scipy_opt.linear_sum_assignment(cost[:, :n])
    opt = cost[rows, cols].sum()
    got = sum(cost[chosen[j], j] for j in range(n))
    spread = max(cost.max() - cost.min(), 1e-6)
    assert got <= opt + 0.05 * spread * max(n / 50, 1) + 1e-4, (got, opt)
    return got, opt


def test_all_zero_costs():
    cost = np.zeros((30, 8), np.float32)
    _check(cost, np.ones(8, bool))


def test_identical_columns():
    rng = np.random.default_rng(0)
    col = rng.standard_normal((40, 1)).astype(np.float32)
    cost = np.repeat(col, 10, axis=1)
    _check(cost, np.ones(10, bool))


def test_identical_rows():
    rng = np.random.default_rng(1)
    row = rng.standard_normal((1, 12)).astype(np.float32)
    cost = np.repeat(row, 50, axis=0)
    _check(cost, np.ones(12, bool))


def test_single_target():
    rng = np.random.default_rng(2)
    cost = rng.standard_normal((900, 1)).astype(np.float32)
    got, opt = _check(cost, np.ones(1, bool))
    assert abs(got - opt) < 1e-5  # single target must be exact


def test_huge_magnitudes():
    rng = np.random.default_rng(3)
    cost = (rng.standard_normal((100, 20)) * 1e6).astype(np.float32)
    _check(cost, np.ones(20, bool))


def test_one_query_clearly_best_for_all():
    # all targets want query 0; auction must resolve the contention
    cost = np.ones((50, 10), np.float32)
    cost[0, :] = -10.0
    cost[1:11, :] -= np.eye(10, dtype=np.float32)[None, :, :].reshape(10, 10) * 0.5
    _check(cost, np.ones(10, bool))
