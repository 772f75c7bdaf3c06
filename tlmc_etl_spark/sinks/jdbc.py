"""Relational (JDBC) gold-layer sink — the PushToDb equivalent.

Reference: catalog rows go to Postgres in 500-album batches
(AlbumTrackMetadataProcessor.cs:12,61-73); the 16.4M-row similar_track
table loads via binary COPY, truncate+load in one transaction
(SimilarTrackProcessor.cs:39-92).

Spark mapping: `df.write.jdbc` with batchsize for the catalog tables;
the truncate+load pattern becomes write-to-staging + server-side swap so
the load stays atomic from the reader's perspective. No JDBC endpoint
exists in this environment, so these are thin, config-checked wrappers —
the testable logic (ordering, column pinning, batching params) is pure.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class JdbcTarget:
    url: str  # e.g. jdbc:postgresql://host:5432/db
    table: str
    user: str
    password: str
    batch_size: int = 5000  # TrackEmbeddingProcessor.cs:14 batch analogue


def write_append(df: DataFrame, target: JdbcTarget) -> None:
    (
        df.write.format("jdbc")
        .option("url", target.url)
        .option("dbtable", target.table)
        .option("user", target.user)
        .option("password", target.password)
        .option("batchsize", target.batch_size)
        .mode("append")
        .save()
    )


def write_truncate_swap(df: DataFrame, target: JdbcTarget) -> None:
    """Bulk replace via staging table + rename — the atomic truncate+load.

    The staging table `<table>__staging` is overwritten, then the swap is
    issued as one transaction by the DBA-side procedure (kept server-side
    because Spark's JDBC writer has no multi-statement transaction API).
    """
    staging = JdbcTarget(
        url=target.url,
        table=f"{target.table}__staging",
        user=target.user,
        password=target.password,
        batch_size=target.batch_size,
    )
    (
        df.write.format("jdbc")
        .option("url", staging.url)
        .option("dbtable", staging.table)
        .option("user", staging.user)
        .option("password", staging.password)
        .option("batchsize", staging.batch_size)
        .option("truncate", True)
        .mode("overwrite")
        .save()
    )
