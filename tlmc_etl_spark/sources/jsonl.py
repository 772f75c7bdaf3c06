"""JSONL journal/measurement readers with bad-line tolerance.

Reference: journals and measurement streams are JSON-per-line files whose
readers tolerate torn/corrupt lines (extract.py:47-61,
loudness_measure.py:146-188 — a crashed writer can leave a partial last
line). Spark's native JSON source covers this with PERMISSIVE mode and a
_corrupt_record column; the helpers here pin that contract and split
good/bad rows explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read JSONL with the given schema; malformed lines land in
    `_corrupt_record` instead of failing the scan."""
    full = schema.add(T.StructField(CORRUPT_COL, T.StringType(), True))
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, corrupt_lines_only).

    The cache is required: Spark refuses to answer queries that reference
    only the internal corrupt-record column of an uncached JSON scan
    (journals are small, so caching them is the intended usage anyway).
    """
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


LOUDNESS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("i", T.DoubleType()),
        T.StructField("tp", T.DoubleType()),
        T.StructField("lra", T.DoubleType()),
        T.StructField("gain_db", T.DoubleType()),
        T.StructField("source", T.StringType()),
    ]
)

JOURNAL_SCHEMA = T.StructType([T.StructField("item_id", T.StringType())])
