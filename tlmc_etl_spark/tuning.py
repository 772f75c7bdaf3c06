"""Plan-embedded parallelism hints for Python-CPU stages.

AQE's partition coalescing is byte-based and blind to CPU cost: a few
hundred KB of shuffle feeding a pandas-UDF stage collapses to one task
under the default 1 MiB advisory floor (measured 8x slowdown on the
Hungarian match at sf0.1). Round 2 fixed that with a session-wide
`coalescePartitions.minPartitionSize=1b` + `parallelismFirst=true`, which
un-coalesced EVERY tiny shuffle and regressed the pure-JVM relational
suite 2-4x (scheduling overhead exceeded the work at sf0.1).

The scoped fix lives in the plan, not the session: Spark exempts
user-specified repartition counts (ShuffleOrigin REPARTITION_BY_NUM) from
AQE coalescing, so `fanout(df, keys)` immediately before a heavy
`applyInPandas`/`mapInPandas` pins that one exchange at full parallelism
while every relational shuffle keeps normal AQE behavior. When keys match
the downstream groupBy, Catalyst reuses the hash partitioning and no
second exchange is added.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


def fanout(df: DataFrame, *cols: str, parts: int | None = None) -> DataFrame:
    """Repartition with an explicit (AQE-coalesce-exempt) partition count.

    Use directly before a CPU-bound Python stage whose shuffle input is
    small in bytes but expensive per row. With `cols`, hash-partitions on
    them (a following groupBy on the same keys adds no exchange); without,
    round-robins rows across tasks.

    The default count is the session's `spark.sql.shuffle.partitions`,
    NOT defaultParallelism: a keyed fanout often feeds one side of a
    groupBy/cogroup whose other side hash-partitions at
    shuffle.partitions, and when the two counts differ EnsureRequirements
    inserts an extra aligning exchange (breaking the pinned-parallelism
    point of the fanout and the plans' shuffle budgets). In this repo's
    session the two are the same number (session.py sizes both to
    $SPARK_GRAFT_CPUS), but the alignment must not depend on that.
    """
    n = parts or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *cols) if cols else df.repartition(n)


def bounded_one_partition(numeric_col) -> "Column":  # noqa: F821
    """Constant-but-NON-FOLDABLE window partition key (pmod(key, 1) = 0
    for every row) for ranking a PROVABLY BOUNDED input — a
    TakeOrdered/limit result or a fixed-size dimension.

    A bare `W.orderBy(...)` window leaves partitionSpec empty, and
    WindowExec then warns "Moving all data to a single partition" on
    every run even when "all data" is ≤100 rows by construction — log
    noise that buries real single-partition hazards. A literal
    partition key does not help: Catalyst folds foldable partition
    expressions away and the spec is empty again. pmod(key, 1)
    references a column, so it survives optimization, WindowExec sees a
    real (one-group) partitionSpec, and execution is the same bounded
    single partition. The plan lint (tests/test_plan_quality.py) treats
    this idiom as a GLOBAL window — using it over a non-limited input
    still fails CI; it silences the warning only where the boundedness
    is structural.

    NULL keys coalesce to 0 first: pmod(NULL, 1) is NULL, which would
    split NULL-key rows into a SECOND window partition and restart
    row_number there (duplicate ranks). coalesce(col, 0) still
    references the column, so the expression stays non-foldable.
    """
    from pyspark.sql import functions as F

    c = F.col(numeric_col) if isinstance(numeric_col, str) else numeric_col
    return F.pmod(F.coalesce(c, F.lit(0)), F.lit(1))


@contextmanager
def dimension_exec(spark, est_rows: int, rows_per_task: int = 65_536):
    """Scoped execution context for materializing a DIMENSION-sized
    subtree (catalog/release tables, top-k results, month domains):
    static shuffle partitions sized from the caller's row estimate, AQE
    off for the duration.

    Why: AQE materializes every Exchange as its own one-task stage-JOB
    on dimension data, and the catalog subtree pays ~14 sequential
    scheduler round-trips per materialization (round-15 measurement:
    AQE off alone cut lifecycle jobs 43->17 but left the wall flat,
    because the then-static 32-partition stages ran 32 tasks over
    24 rows — the scheduling saved per stage came back as task
    overhead). The fix needs BOTH halves: one static plan (no
    per-exchange stage jobs) AND a partition count derived from the
    dimension's size (1 task per ~64k rows, capped at the session's
    shuffle.partitions so a genuinely large "dimension" still spreads).
    Parameterized by the caller's row estimate — typically a parquet
    footer count (sources.tables.table_row_count) — never a local[32]
    constant.

    Measured (round 16, lifecycle catalog count): the cascade is mostly
    BroadcastExchange BUILD jobs — every dimension-dimension join spawns
    a sequential broadcast-build job regardless of AQE — so when the
    size estimate says the whole subtree fits ONE task, broadcasts are
    disabled too and every join runs as a single-partition sort-merge:
    the materialization collapses to ONE job whose stages chain without
    scheduler round-trips (15 jobs -> 1 job / 16 one-task stages). With
    more than one derived partition the broadcast threshold is left
    alone (a genuinely wide dimension still wants hash-join builds).

    MUST wrap the plan-compilation points, not just the action:
    `persist()` compiles the physical plan eagerly when called, so a
    persist outside the context freezes the default-conf plan no matter
    what the later count runs under.

    Use ONLY around actions whose whole subtree is dimension-scale:
    corpus-sized inputs must keep AQE (skew handling, runtime
    coalescing, runtime broadcast selection).
    """
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = max(1, min(est_rows // rows_per_task + 1, cur))
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    if parts == 1:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(cur))
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
