"""Rate-limited enrichment: the reference's `sleep(0.5/1.5)` between API
calls (song_page_scraper.py:142,157) as an ENGINE contract instead of an
imperative loop.

Two halves, split exactly where determinism splits:

 - `dispatch_schedule` — the PLAN: assign each request to one of k
   workers by a portable hash and give it a scheduled dispatch offset
   (seq_within_worker - 1) / rps. Pure relational arithmetic, so the
   global-rate guarantee (k workers × rps each) is a DataFrame any
   oracle can replay — and the schedule is inspectable/auditable before
   a single call fires, which a sleep() buried in a scraper loop never
   is.
 - `TokenBucket` / `rate_limited` — the ENFORCEMENT: a per-task token
   bucket that paces an arbitrary row-level callable (the LLM healer,
   an HTTP fetch). Wall-clock behavior, so it is property-tested with an
   injected clock, not an oracle.

Scale shape: there is no global coordinator — the budget is divided
across workers up front (worker = hash(key) % k), so enforcement is
embarrassingly parallel and the aggregate rate is bounded by k × rps by
construction. Skewed keys only UNDER-use the budget, never exceed it.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tlmc_etl_spark.operators.dedup import portable_hash60


class TokenBucket:
    """Token bucket: `rate` tokens/sec, capacity `burst`. `acquire()`
    blocks (via the injected sleep) until a token is available — the
    first `burst` calls pass immediately, then calls pace at 1/rate.

    Clock and sleep are injectable so tests pin the pacing law exactly
    instead of flaking on wall time."""

    def __init__(
        self,
        rate: float,
        burst: int = 1,
        clock: Callable[[], float] | None = None,
        sleep: Callable[[float], None] | None = None,
    ):
        if rate <= 0:
            raise ValueError("rate must be positive")
        if burst < 1:
            raise ValueError("burst must be >= 1")
        self.rate = float(rate)
        self.burst = int(burst)
        self.clock = clock or time.monotonic
        self.sleep = sleep or time.sleep
        self._tokens = float(burst)
        self._last = self.clock()

    def acquire(self) -> float:
        """Take one token, sleeping if none is available; returns the
        seconds slept (0.0 for an immediate pass)."""
        now = self.clock()
        self._tokens = min(self.burst, self._tokens + (now - self._last) * self.rate)
        self._last = now
        if self._tokens >= 1.0:
            self._tokens -= 1.0
            return 0.0
        wait = (1.0 - self._tokens) / self.rate
        self.sleep(wait)
        self._last = self.clock()
        self._tokens = 0.0  # the waited-for token is consumed on arrival
        return wait


def rate_limited(
    fn: Callable,
    rps: float,
    burst: int = 1,
    clock: Callable[[], float] | None = None,
    sleep: Callable[[float], None] | None = None,
) -> Callable:
    """Wrap a row-level callable so each invocation first acquires from
    a per-wrapper token bucket — ONE bucket per task when constructed
    inside the UDF/mapInPandas closure, which is the intended use:
    global rate <= n_tasks × rps by construction."""
    bucket = TokenBucket(rps, burst=burst, clock=clock, sleep=sleep)

    def paced(*args, **kwargs):
        bucket.acquire()
        return fn(*args, **kwargs)

    return paced


def dispatch_schedule(
    requests: DataFrame,
    key_col: str,
    n_workers: int,
    rps_per_worker: float,
) -> DataFrame:
    """Deterministic dispatch plan: worker = portable_hash(key) % k,
    seq = rank within worker (key order), scheduled_offset_s =
    (seq - 1) / rps. The aggregate dispatch rate is bounded by
    k × rps_per_worker; per-worker order is total and reproducible, so
    a resumed run re-derives the identical schedule.

    Duplicate key values are totally ordered by (key, portable hash of
    key) — since equal keys share a hash, ties among them are broken by
    Spark's row_number over an ordering that cannot distinguish them,
    so when `key_col` is non-unique the rows of one key value receive
    an arbitrary-but-contiguous block of seq numbers. Their OFFSETS are
    still deterministic as a multiset (same keys → same offset set on
    every run); only WHICH duplicate gets which offset can vary. For a
    byte-identical resumed schedule pass a unique key."""
    if n_workers < 1:
        raise ValueError("n_workers must be >= 1")
    if rps_per_worker <= 0:
        raise ValueError("rps_per_worker must be positive")
    worker = F.pmod(portable_hash60(F.col(key_col).cast("string")), F.lit(n_workers))
    w = W.partitionBy("worker").orderBy(key_col)
    return (
        requests.withColumn("worker", worker.cast("int"))
        .withColumn("seq", F.row_number().over(w))
        .withColumn(
            "scheduled_offset_s",
            F.round((F.col("seq") - 1) / F.lit(float(rps_per_worker)), 4),
        )
    )
