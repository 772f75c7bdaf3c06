"""Rate-limited enrichment (operators/ratelimit.py): token-bucket pacing
law under an injected clock, wrapper behavior, and the dispatch plan's
global-rate bound. Reference contract: sleep(0.5/1.5) between API calls
(song_page_scraper.py:142,157)."""

from __future__ import annotations

import pytest

from tlmc_etl_spark.operators.ratelimit import (
    TokenBucket,
    dispatch_schedule,
    rate_limited,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        assert s >= 0
        self.t += s


def test_bucket_paces_at_exactly_one_over_rate():
    clk = FakeClock()
    b = TokenBucket(rate=2.0, clock=clk, sleep=clk.sleep)
    times = []
    for _ in range(5):
        b.acquire()
        times.append(clk.t)
    # first passes immediately, then exactly 0.5 s apart — no drift,
    # no over-sleeping
    assert times == [0.0, 0.5, 1.0, 1.5, 2.0]


def test_bucket_burst_allows_initial_batch_then_paces():
    clk = FakeClock()
    b = TokenBucket(rate=1.0, burst=3, clock=clk, sleep=clk.sleep)
    times = []
    for _ in range(5):
        b.acquire()
        times.append(clk.t)
    assert times[:3] == [0.0, 0.0, 0.0]  # burst capacity
    assert times[3:] == [1.0, 2.0]


def test_bucket_refills_during_idle_up_to_burst():
    clk = FakeClock()
    b = TokenBucket(rate=2.0, burst=2, clock=clk, sleep=clk.sleep)
    b.acquire()
    b.acquire()  # burst drained at t=0
    clk.t = 10.0  # long idle: refill caps at burst, never beyond
    assert b.acquire() == 0.0
    assert b.acquire() == 0.0
    assert b.acquire() == pytest.approx(0.5)  # third call waits 1/rate


def test_bucket_rejects_bad_knobs():
    with pytest.raises(ValueError):
        TokenBucket(rate=0)
    with pytest.raises(ValueError):
        TokenBucket(rate=1.0, burst=0)


def test_rate_limited_wrapper_paces_and_passes_through():
    clk = FakeClock()
    calls = []

    def fetch(x, suffix=""):
        calls.append((clk.t, x, suffix))
        return f"{x}{suffix}"

    paced = rate_limited(fetch, rps=4.0, clock=clk, sleep=clk.sleep)
    out = [paced(i, suffix="!") for i in range(3)]
    assert out == ["0!", "1!", "2!"]
    assert [t for t, _, _ in calls] == [0.0, 0.25, 0.5]


def test_dispatch_schedule_bounds_the_global_rate(spark, sf_dir):
    from tlmc_etl_spark.sources.tables import load_table

    req = (
        load_table(spark, sf_dir, "orders")
        .filter("o_orderkey % 25 = 0")
        .selectExpr("o_orderkey AS req_key")
    )
    k, rps = 8, 2.0
    plan = dispatch_schedule(req, "req_key", n_workers=k, rps_per_worker=rps)
    rows = plan.collect()
    assert len(rows) == req.count()
    assert all(0 <= r["worker"] < k for r in rows)
    # per-worker: dense 1..n sequence and offsets exactly (seq-1)/rps —
    # so within ANY window of w seconds each worker dispatches at most
    # ceil(w*rps) requests, bounding the aggregate at k*rps
    from collections import defaultdict

    by_worker = defaultdict(list)
    for r in rows:
        by_worker[r["worker"]].append(r)
    for members in by_worker.values():
        members.sort(key=lambda r: r["seq"])
        assert [m["seq"] for m in members] == list(range(1, len(members) + 1))
        for m in members:
            assert m["scheduled_offset_s"] == pytest.approx((m["seq"] - 1) / rps)


def test_dispatch_schedule_is_resume_stable(spark, sf_dir):
    # re-deriving the plan over the same worklist yields the identical
    # schedule — a crashed scraper resumes into the same slots
    from tlmc_etl_spark.sources.tables import load_table

    req = (
        load_table(spark, sf_dir, "orders")
        .filter("o_orderkey % 25 = 0")
        .selectExpr("o_orderkey AS req_key")
    )
    a = sorted(map(tuple, dispatch_schedule(req, "req_key", 4, 1.0).collect()))
    b = sorted(map(tuple, dispatch_schedule(req, "req_key", 4, 1.0).collect()))
    assert a == b
