"""Property tests for gap_fill_numbers — the free-slot renumbering both
the disc and track stages of the flagship pipeline ride
(info_scanner_ph3.py:42-84 semantics). A python reference implementation
recomputes the assignment for arbitrary generated groups; the
distributed rewrite must agree exactly, including under duplicate valid
numbers and all-invalid groups.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from tlmc_etl_spark.operators.windows import gap_fill_numbers

# one group: list of (valid, number) rows; order_col is the row index
group_strategy = st.lists(
    st.tuples(st.booleans(), st.integers(min_value=1, max_value=20)),
    min_size=1,
    max_size=8,
)


def reference_assign(rows):
    """info_scanner_ph3's free-slot algorithm, sequentially."""
    taken = {n for valid, n in rows if valid}
    out = []
    free = (n for n in range(1, len(rows) + 21) if n not in taken)
    for i, (valid, n) in enumerate(rows):
        out.append(n if valid else next(free))
    return out


@given(groups=st.lists(group_strategy, min_size=1, max_size=5))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gap_fill_matches_sequential_reference(spark, groups):
    rows = []
    expected = {}
    for g, grp_rows in enumerate(groups):
        assigned = reference_assign(grp_rows)
        for i, ((valid, n), want) in enumerate(zip(grp_rows, assigned)):
            rows.append((g, i, n if valid else 0, valid))
            expected[(g, i)] = want
    df = spark.createDataFrame(rows, "grp int, ord int, number int, is_valid boolean")
    got = gap_fill_numbers(
        df,
        group_cols=["grp"],
        number_col="number",
        valid_col="is_valid",
        order_cols=["ord"],
        out_col="assigned",
    ).collect()
    assert len(got) == len(rows), "row count must be preserved"
    for r in got:
        assert r["assigned"] == expected[(r["grp"], r["ord"])], (
            f"group {r['grp']} ord {r['ord']}: got {r['assigned']}, "
            f"want {expected[(r['grp'], r['ord'])]}"
        )


@given(groups=st.lists(group_strategy, min_size=1, max_size=4))
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gap_fill_invalid_rows_get_unique_positive_numbers(spark, groups):
    rows = [
        (g, i, n if valid else 0, valid)
        for g, grp_rows in enumerate(groups)
        for i, (valid, n) in enumerate(grp_rows)
    ]
    df = spark.createDataFrame(rows, "grp int, ord int, number int, is_valid boolean")
    got = gap_fill_numbers(
        df, ["grp"], "number", "is_valid", ["ord"], out_col="assigned"
    )
    # collision-proof: within a group, no invalid row may share a number
    # with any valid row or another invalid row; everything positive
    per_group = (
        got.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.when(~F.col("is_valid"), F.col("assigned"))).alias("nd_invalid"),
            F.sum(F.when(~F.col("is_valid"), 1).otherwise(0)).alias("n_invalid"),
            F.min("assigned").alias("mn"),
        )
        .collect()
    )
    for r in per_group:
        assert r["mn"] >= 1
        assert r["nd_invalid"] == r["n_invalid"], "invalid rows must get distinct slots"
    clash = (
        got.filter(~F.col("is_valid"))
        .select("grp", F.col("assigned").alias("a"))
        .join(
            got.filter(F.col("is_valid")).select("grp", F.col("assigned").alias("a")),
            ["grp", "a"],
        )
        .count()
    )
    assert clash == 0, "invalid rows must never collide with kept numbers"
