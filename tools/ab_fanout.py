"""Same-run A/B: fanout-before-persist on JVM-only reuse tables, on vs off.

Bisect harness for the round-3 minhash regression. Monkeypatches the
`fanout` symbol inside the operator/plan modules (identity when off) and
times registry queries interleaved in one session. Python-CPU-stage
fanouts in other modules are untouched.

Usage: python tools/ab_fanout.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from tlmc_etl_spark import tuning
from tlmc_etl_spark.operators import dedup as op_dedup
from tlmc_etl_spark.plans import QUERIES
from tlmc_etl_spark.plans import text as plan_text
from tlmc_etl_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NAMES = sys.argv[2:] or [
    "minhash_lsh_prodhash",
    "simhash_prodhash",
    "ngram_jaccard_capped",
    "doc_dedup_clusters",
]

PATCH_MODULES = [op_dedup, plan_text]


def set_fanout(on: bool) -> None:
    fn = tuning.fanout if on else (lambda df, *cols, parts=None: df)
    for m in PATCH_MODULES:
        m.fanout = fn


def timed(spark, name: str) -> tuple[int, float]:
    t0 = time.time()
    n = QUERIES[name].fn(spark, SF_DIR).count()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return n, dt


def main() -> None:
    spark = get_spark("ab-fanout")
    for name in NAMES:  # warm both variants once
        for on in (True, False):
            set_fanout(on)
            timed(spark, name)
    for rep in range(2):
        for name in NAMES:
            for on in (True, False):
                set_fanout(on)
                load = open("/proc/loadavg").read().split()[0]
                n, dt = timed(spark, name)
                tag = "fanout-on " if on else "fanout-off"
                print(f"rep{rep} {name:24s} {tag} rows={n:8d} {dt:6.2f}s load={load}", flush=True)


if __name__ == "__main__":
    main()
