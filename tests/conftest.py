from __future__ import annotations

import io
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tlmc_etl_spark.session import get_spark
from tlmc_etl_spark.sources.tables import TABLES

SF_DIR = os.environ.get("TLMC_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "8")
    s = get_spark("tlmc-etl-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


class ByteCountingReader(io.BytesIO):
    """Seekable reader that counts bytes actually read — the archive
    range-read tests assert listing I/O stays O(headers)."""

    def __init__(self, data: bytes):
        super().__init__(data)
        self.bytes_read = 0

    def read(self, n=-1):
        out = super().read(n)
        self.bytes_read += len(out)
        return out
