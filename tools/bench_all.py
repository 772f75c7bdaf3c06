"""Time every registered query at a scale dir (default sf0.1), slowest
first — the perf-regression sweep behind bench.py's headline set.

Usage: python tools/bench_all.py [sf_dir] [n_repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tlmc_etl_spark.plans import QUERIES
from tlmc_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark("bench-all")
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}
    for name, q in QUERIES.items():
        try:
            q.fn(spark, warm_dir).count()
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            times[name] = best
        except Exception as e:  # noqa: BLE001
            print(f"{name:35s} ERROR {str(e)[:80]}")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{name:35s} {t:7.3f}s")
    print(f"{'TOTAL':35s} {sum(times.values()):7.3f}s over {len(times)} queries")


if __name__ == "__main__":
    main()
