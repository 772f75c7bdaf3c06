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


def test_composed_plan_total_is_permutation_optimal(spark, sf_dir):
    """Optimality of the COMPOSED plan, not just the solver: for every
    group small enough to enumerate (≤8 per side), the registered
    query's group_total must equal the exhaustive-permutation maximum
    of the similarity matrix, rebuilt here from the raw parquet inputs.
    scipy-parity proves the solver agrees with scipy; this proves the
    whole Spark path — grouping, union tagging, per-group matrix build,
    sign flip, acceptance arithmetic — lost nothing on the way."""
    import duckdb

    from tlmc_etl_spark.operators.fuzzy import similarity
    from tlmc_etl_spark.plans import QUERIES

    got = QUERIES["fuzzy_hungarian_fuzztitles"].fn(spark, sf_dir).collect()
    totals = {r["grp"]: r["group_total"] for r in got}
    accepts = {r["grp"]: r["accepted"] for r in got}

    con = duckdb.connect()
    parts = con.execute(
        f"SELECT p_size, p_partkey, p_name FROM '{sf_dir}/part.parquet'"
    ).fetchall()
    left: dict[int, list] = {}
    right: dict[int, list] = {}
    for size, key, name in parts:
        left.setdefault(size, []).append((str(key), name))
        right.setdefault(size, []).append((f"w_{key}", name[:-2].upper()))

    checked = 0
    for grp in sorted(left):
        L, R = left[grp], right.get(grp, [])
        n, m = len(L), len(R)
        if n == 0 or m == 0 or max(n, m) > 8:
            continue
        S = [[similarity(a[1], b[1]) for b in R] for a in L]
        if n <= m:
            best = max(
                sum(S[i][perm[i]] for i in range(n))
                for perm in itertools.permutations(range(m), n)
            )
        else:
            best = max(
                sum(S[perm[j]][j] for j in range(m))
                for perm in itertools.permutations(range(n), m)
            )
        assert grp in totals, f"group {grp} missing from the plan output"
        assert abs(totals[grp] - round(best, 4)) < 1e-6, (
            f"group {grp}: plan total {totals[grp]} != permutation optimum {best}"
        )
        # the reference acceptance rule, recomputed from first principles
        assert accepts[grp] == (best >= 0.8 * 100.0 * min(n, m))
        checked += 1
    assert checked >= 10, f"only {checked} enumerable groups — gate too weak"


def test_acceptance_threshold_closed_form(spark):
    """Σ ≥ 0.8 · 100 · min(|L|,|R|) pinned by exact-arithmetic cases
    (song_info_matcher.py:147-163): disjoint alphabets score exactly 0,
    identical keys exactly 100, so the group totals are closed-form."""
    from tlmc_etl_spark.operators.fuzzy import hungarian_match_join

    left = spark.createDataFrame(
        [(1, "a1", "aaaa"), (1, "a2", "bbbb"), (2, "a3", "aaaa"), (2, "a4", "bbbb")],
        "grp long, id string, title string",
    )
    right = spark.createDataFrame(
        # group 1: perfect double match (total 200 ≥ 160 → accepted);
        # group 2: one perfect + one zero (total 100 < 160 → rejected)
        [(1, "b1", "aaaa"), (1, "b2", "bbbb"), (2, "b3", "aaaa"), (2, "b4", "zzzz")],
        "grp long, id string, title string",
    )
    rows = hungarian_match_join(
        left, right, "grp", "id", "title", "id", "title", accept_fraction=0.8
    ).collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append(r)
    assert {r["group_total"] for r in by_grp[1]} == {200.0}
    assert all(r["accepted"] for r in by_grp[1])
    assert {r["group_total"] for r in by_grp[2]} == {100.0}
    assert not any(r["accepted"] for r in by_grp[2])
