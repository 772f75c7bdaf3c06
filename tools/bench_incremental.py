"""Bench the composed incremental stream (streaming/incremental.py):
end-to-end seconds to drain a ~1k-album change journal through
journal_tail → per-batch catalog rebuild → keyed gold merge.

The metadata fixture carries 24 albums; production deltas are
thousands. Replication is key-shifted (suffix circle_dir/album_dir with
a copy index), the same trick tools/gen_scale.py uses for the sf1
tables: every copy is an independent album (the catalog pipeline never
crosses album boundaries), so per-copy workload is identical and the
measured wall is the per-album cost × N with the streaming machinery's
fixed overhead amortized — the number a nightly 1k-album delta actually
pays.

Usage: python tools/bench_incremental.py [--albums 1000]
Prints one JSON line:
  {"metric": "incremental_stream_wall", "albums": N,
   "sec_total": S, "sec_per_1k_albums": S*1000/N}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

FIXTURES = os.path.join(ROOT, "fixtures", "metadata")


def replicated_inputs(spark, n_albums: int):
    """Fixture manifest/probe replicated to >= n_albums independent
    albums via key-shifted copies (suffix on the album key columns)."""
    from pyspark.sql import functions as F

    manifest = spark.read.parquet(os.path.join(FIXTURES, "manifest.parquet"))
    probe = spark.read.parquet(os.path.join(FIXTURES, "probe.parquet"))
    base_albums = manifest.select("circle_dir", "album_dir").distinct().count()
    n_copies = max(1, -(-n_albums // base_albums))

    def expand(df, cols):
        copies = F.explode(F.sequence(F.lit(0), F.lit(n_copies - 1))).alias("__copy")
        out = df.select("*", copies)
        for c in cols:
            out = out.withColumn(
                c,
                F.when(F.col("__copy") == 0, F.col(c)).otherwise(
                    F.concat(F.col(c), F.lit(" #"), F.col("__copy").cast("string"))
                ),
            )
        return out.drop("__copy")

    # probe joins manifest rows by path: shift it identically so every
    # copy keeps the same probe hit rate as the original.
    man_cols = [c for c in ("circle_dir", "album_dir", "path") if c in manifest.columns]
    probe_cols = [c for c in ("circle_dir", "album_dir", "path") if c in probe.columns]
    return expand(manifest, man_cols), expand(probe, probe_cols), n_copies


def run(spark, n_albums: int) -> dict:
    """Measure the incremental drain on an existing session; returns the
    artifact dict (importable so bench.py can embed the number without
    spawning a second JVM)."""
    from tlmc_etl_spark.streaming.incremental import (
        start_incremental_catalog_stream,
    )

    manifest, probe, n_copies = replicated_inputs(spark, n_albums)
    manifest = manifest.localCheckpoint(eager=True)
    probe = probe.localCheckpoint(eager=True)
    albums = [
        (r["circle_dir"], r["album_dir"])
        for r in manifest.select("circle_dir", "album_dir").distinct().collect()
    ]

    work = tempfile.mkdtemp(prefix="binc_")
    try:
        journal = os.path.join(work, "changes.jsonl")
        with open(journal, "w") as fh:
            for circle, album in albums:
                fh.write(json.dumps({"circle_dir": circle, "album_dir": album}) + "\n")

        # warm: tiny drain in a throwaway target compiles the plan/codegen
        warm_journal = os.path.join(work, "warm.jsonl")
        with open(warm_journal, "w") as fh:
            fh.write(json.dumps({"circle_dir": albums[0][0], "album_dir": albums[0][1]}) + "\n")
        q = start_incremental_catalog_stream(
            spark, warm_journal, manifest, probe,
            os.path.join(work, "warm_gold"), os.path.join(work, "warm_ckpt"),
        )
        q.awaitTermination(300)

        t0 = time.perf_counter()
        q = start_incremental_catalog_stream(
            spark, journal, manifest, probe,
            os.path.join(work, "gold"), os.path.join(work, "ckpt"),
        )
        q.awaitTermination(900)
        wall = time.perf_counter() - t0

        n_gold = spark.read.parquet(os.path.join(work, "gold")).count()
        assert n_gold == len(albums), f"gold rows {n_gold} != albums {len(albums)}"
    finally:
        shutil.rmtree(work, ignore_errors=True)

    return {
        "metric": "incremental_stream_wall",
        "albums": len(albums),
        "fixture_copies": n_copies,
        "sec_total": round(wall, 3),
        "sec_per_1k_albums": round(wall * 1000.0 / len(albums), 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--albums", type=int, default=1000)
    args = ap.parse_args()

    from tlmc_etl_spark.session import get_spark

    spark = get_spark("tlmc-etl-bench-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, args.albums)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
