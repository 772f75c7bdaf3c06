"""Multimodal query catalog: binary-payload feature extraction as a
first-class, oracle-checked query.

The decode step is the deterministic synthetic stub from
operators/multimodal.py (real codecs aren't in this container); everything
around it — media-table construction, Arrow-batched `mapInPandas` decode,
feature explode — is the real plumbing a 100 TB media pipeline uses
(SURVEY.md §2.10: ffprobe/ffmpeg/MERT stages). Because the stub is a pure
function of the payload bytes (sha256 → centered unit vector), DuckDB can
reproduce it with byte arithmetic on the hex digest, giving this UDF path a
full value-level oracle instead of a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tlmc_etl_spark.operators.multimodal import extract_features, synthetic_media_from_documents
from tlmc_etl_spark.plans.registry import query
from tlmc_etl_spark.sources.tables import load_table

_FEATURE_ORACLE = """
WITH m AS (
  SELECT 'doc-' || doc_id AS media_id,
         octet_length(encode(text)) AS n_bytes,
         sha256(text) AS h
  FROM documents
), raw AS (
  SELECT media_id, n_bytes,
         list_transform(range(16), i ->
           CAST(('0x' || substr(h, 4*i+1, 2))::INT
                + 256 * ('0x' || substr(h, 4*i+3, 2))::INT AS DOUBLE)) AS r
  FROM m
), cent AS (
  SELECT media_id, n_bytes, list_transform(r, x -> x - list_sum(r) / 16.0) AS v
  FROM raw
), unit AS (
  SELECT media_id, n_bytes, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM cent
)
SELECT media_id, n_bytes, t.pos - 1 AS pos, round(v[t.pos] / nrm, 6) AS f
FROM unit, LATERAL (SELECT unnest(generate_series(1, 16)) AS pos) t
"""


@query("multimodal_features", oracle=_FEATURE_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → synthetic media table (payload = utf-8 bytes, typed
    metadata struct) → batched decode UDF → exploded feature components.

    Reference: media probe/feature stages ride `mapInPandas` so one task
    amortizes many files (hls_assignment.py:109-169's one-process fusion);
    the oracle reproduces the stub decode (sha256 → uint16-LE → centered
    unit vector) byte-for-byte in SQL, so the whole UDF path is value-checked,
    not just row-counted.
    """
    docs = load_table(spark, sf_dir, "documents")
    media = synthetic_media_from_documents(docs)
    feats = extract_features(media)
    return feats.select(
        "media_id", "n_bytes", F.posexplode("feature").alias("pos", "f0")
    ).select("media_id", "n_bytes", "pos", F.round("f0", 6).alias("f"))


_PROBE_ORACLE = """
SELECT 'order_' || o_orderkey || '.flac' AS fname,
       CASE WHEN o_orderkey % 300 = 0 THEN NULL
            ELSE round((1000 + o_orderkey % 5000) / 1000.0, 6) END AS duration_s,
       CASE WHEN o_orderkey % 300 = 0 THEN NULL ELSE 'flac' END AS codec,
       o_orderkey % 300 <> 0 AS ok,
       CASE WHEN o_orderkey % 300 = 0 THEN 'exit_1' END AS reason
FROM orders WHERE o_orderkey % 100 = 0
"""


@query("subprocess_probe_scan", oracle=_PROBE_ORACLE)
def subprocess_probe_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-UDF probe, executed for REAL: deterministic media files are
    written distributedly, then probed by an actual child process per file
    (tools/fake_ffprobe — the ffprobe interface with content-driven
    failure modes) through operators/process.probe_media_paths.

    Every 3rd sampled order plants a corrupt file, so the driver-visible
    result includes bad-exit rows isolated per the binvec contract. The
    oracle re-derives duration/codec/ok from the same size arithmetic the
    writer used — any drift in spawn/parse/framing hash-fails. Reference:
    info_scanner_ph1.py:550-616 (ffprobe spawn + JSON parse + journal).
    """
    import os
    import shutil
    import sys

    import pandas as pd

    from tlmc_etl_spark.operators.process import probe_media_paths

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    out_dir = os.path.join(
        repo_root, ".scratch", f"probe_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    spec = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", (F.col("o_orderkey") % 300 == 0).alias("corrupt"))
    )

    def write_files(batches):
        for pdf in batches:
            paths = []
            for k, corrupt in zip(pdf["o_orderkey"], pdf["corrupt"]):
                p = os.path.join(out_dir, f"order_{k}.flac")
                body = (
                    b"CORRUPT" + b"x" * 100
                    if corrupt
                    else b"x" * (1000 + int(k) % 5000)
                )
                with open(p, "wb") as fh:
                    fh.write(body)
                paths.append(p)
            yield pd.DataFrame({"path": paths})

    # localCheckpoint materializes the writes BEFORE any probe spawns —
    # the write stage is a side-effecting task, not lazy plan text.
    files = spec.mapInPandas(write_files, schema="path string").localCheckpoint(
        eager=True
    )
    probed = probe_media_paths(
        files,
        probe_cmd=[sys.executable, os.path.join(repo_root, "tools", "fake_ffprobe")],
        timeout_s=30.0,
    )
    return probed.select(
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        F.round("duration_s", 6).alias("duration_s"),
        "codec",
        "ok",
        "reason",
    ).orderBy("fname")
