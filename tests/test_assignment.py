"""Hungarian assignment: differential test against brute-force enumeration
(the engine's stand-in for scipy's linear_sum_assignment)."""

from __future__ import annotations

import itertools

import numpy as np

from tlmc_etl_spark.operators.assignment import linear_sum_assignment


def brute_minimum(cost: np.ndarray) -> float:
    n, m = cost.shape
    if n <= m:
        return min(
            sum(cost[i, perm[i]] for i in range(n))
            for perm in itertools.permutations(range(m), n)
        )
    return min(
        sum(cost[perm[j], j] for j in range(m))
        for perm in itertools.permutations(range(n), m)
    )


def test_optimal_on_random_rectangles():
    rng = np.random.default_rng(7)
    for _ in range(200):
        n, m = rng.integers(1, 7, size=2)
        cost = rng.random((n, m)) * 10
        r, c = linear_sum_assignment(cost)
        assert len(r) == min(n, m)
        assert len(set(r.tolist())) == len(r)
        assert len(set(c.tolist())) == len(c)
        assert abs(cost[r, c].sum() - brute_minimum(cost)) < 1e-9


def test_maximization_via_negation():
    s = np.array([[100.0, 10.0], [10.0, 100.0]])
    r, c = linear_sum_assignment(-s)
    assert s[r, c].sum() == 200.0
