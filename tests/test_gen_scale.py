"""Invariants of the sf1 scale-up generator (tools/gen_scale.py).

The scaling curve's validity rests on three generator properties:
determinism (two runs → byte-identical data), referential integrity
under key shifting, and copy inertness (no cross-copy duplicate pairs
manufactured — token spaces disjoint, embedding cosines preserved
intra-copy by an orthogonal transform). Pure DuckDB/numpy — no Spark.
"""

from __future__ import annotations

import subprocess
import sys

import duckdb
import numpy as np
import pytest

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gen") / "sf2x")
    r = subprocess.run(
        [sys.executable, "tools/gen_scale.py", out, "--src", SRC, "--copies", "3"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr
    return out


def test_deterministic_across_runs(scaled, tmp_path):
    out2 = str(tmp_path / "again")
    subprocess.run(
        [sys.executable, "tools/gen_scale.py", out2, "--src", SRC, "--copies", "3"],
        capture_output=True,
        check=True,
    )
    con = duckdb.connect()
    for t in ("lineitem", "documents", "embeddings", "events"):
        a = con.execute(
            f"SELECT md5(string_agg(r::VARCHAR, '|' ORDER BY r::VARCHAR)) "
            f"FROM (SELECT t AS r FROM '{scaled}/{t}.parquet' t)"
        ).fetchone()[0]
        b = con.execute(
            f"SELECT md5(string_agg(r::VARCHAR, '|' ORDER BY r::VARCHAR)) "
            f"FROM (SELECT t AS r FROM '{out2}/{t}.parquet' t)"
        ).fetchone()[0]
        assert a == b, f"{t} differs between generator runs"


def test_referential_integrity_after_shift(scaled):
    con = duckdb.connect()
    orphans = con.execute(
        f"""
        SELECT count(*) FROM '{scaled}/lineitem.parquet' l
        LEFT JOIN '{scaled}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
        """
    ).fetchone()[0]
    assert orphans == 0
    orphans = con.execute(
        f"""
        SELECT count(*) FROM '{scaled}/orders.parquet' o
        LEFT JOIN '{scaled}/customer.parquet' c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL
        """
    ).fetchone()[0]
    assert orphans == 0


def test_copies_share_no_tokens(scaled):
    """Documents from different copies must share ZERO tokens — the
    property that guarantees no cross-copy shingle/gram/minhash pairs."""
    con = duckdb.connect()
    shared = con.execute(
        f"""
        WITH tok AS (
          SELECT doc_id // 10000000 AS copy, unnest(string_split(text, ' ')) AS t
          FROM '{scaled}/documents.parquet'
        )
        SELECT count(*) FROM (
          SELECT t FROM tok GROUP BY t HAVING count(DISTINCT copy) > 1
        )
        """
    ).fetchone()[0]
    assert shared == 0


def test_embedding_transform_is_orthogonal(scaled):
    """Intra-copy pairwise cosines must match copy 0 exactly (signed
    permutation = orthogonal), and cross-copy cosines must be decorrelated
    (no manufactured near-dups above the 0.8 design threshold)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{scaled}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    by_copy: dict[int, dict[int, np.ndarray]] = {}
    for vid, e in rows:
        by_copy.setdefault(vid // 10_000_000, {})[vid % 10_000_000] = np.array(
            e, dtype=np.float64
        )
    base = by_copy[0]
    ids = sorted(base)[:40]

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for copy, vecs in by_copy.items():
        if copy == 0:
            continue
        for i, j in zip(ids[:-1], ids[1:]):
            assert abs(cos(vecs[i], vecs[j]) - cos(base[i], base[j])) < 1e-6
        cross = max(abs(cos(vecs[i], base[i])) for i in ids)
        assert cross < 0.8, f"copy {copy} too similar to copy 0 ({cross:.3f})"
