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
