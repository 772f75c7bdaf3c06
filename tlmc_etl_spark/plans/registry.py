"""Query catalog registry.

Every operator the engine claims (SURVEY.md §2) registers here as a named
query: a Spark plan builder `(spark, sf_dir) -> DataFrame` plus, for the
relational (t2) surface, the equivalent ANSI SQL that DuckDB runs as the
correctness oracle. Non-SQL-expressible operators (fuzzy/vector/streaming)
register without an oracle and are covered by differential/property tests.

Conventions that keep the hash-oracle stable (SURVEY.md §7.4-1):
 - every computed column is aliased identically in Spark and SQL;
 - float aggregates are rounded (sum→2dp, avg/score→4dp or more as noted);
 - ties in argmax/mode are broken deterministically (value ascending);
 - timestamps are projected as DATE or epoch seconds, never raw timestamps.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

PlanFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: PlanFn
    oracle: str | None  # DuckDB SQL, None for ext-verified operators
    doc: str = ""
    # Some oracles embed TRAINED literals (converged k-means centroids,
    # OPQ rotations) generated at one specific scale factor — they are
    # value-valid only against that data. When set, parity harnesses
    # (tests/test_oracle_parity.py, tools/check_oracle.py) must run BOTH
    # engines at this directory regardless of the requested sf; the
    # driver's own check runs at sf0.01, where these are generated.
    oracle_sf_dir: str | None = None


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a plan builder under `name`."""

    def deco(fn: PlanFn) -> PlanFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, PlanFn]:
    return {name: q.fn for name, q in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
