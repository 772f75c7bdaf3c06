"""Per-session scratch directories for subprocess/sink fixture queries.

Executor tasks write fixture files (fake media, archives, COPY shards)
that later stages re-read — correct only in local mode, where executors
share the driver's filesystem. That is exactly the regime these queries
exist for: they drive a REAL child process or byte-level sink in tests;
a cluster deployment points the same operators at real paths on shared
storage instead of generated fixtures.

Dirs are keyed by the Spark application id so concurrent sessions
(pytest + bench, overlapping oracle sweeps) never rmtree each other's
fixtures mid-run; the per-session subtree is removed and rebuilt on each
call, so re-running a query within one session stays deterministic.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def scratch_dir(spark: SparkSession, kind: str, sf_dir: str) -> str:
    """Fresh scratch dir `.scratch/<appId>/<kind>_<sf>` for this session."""
    out_dir = os.path.join(
        _REPO_ROOT,
        ".scratch",
        spark.sparkContext.applicationId,
        f"{kind}_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    return out_dir
