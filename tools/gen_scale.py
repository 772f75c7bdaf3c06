"""Deterministic scale-up generator: benchdata/sf1 from testdata/sf0.1.

The driver provides sf0.001/0.01/0.1; the 100x-scale claims in this repo
are structurally gated (plan shapes, shuffle budgets) but a measured
scaling curve needs a bigger input. This tool derives an sf1-shaped
dataset from the read-only sf0.1 by key-shifted replication, chosen so
every per-copy workload characteristic (join fan-in, duplicate density,
near-dup cluster sizes, per-user event counts) is IDENTICAL to sf0.1
and copies are mutually inert — so a query whose plan is linear in rows
should measure ~10x, and anything superlinear is the query's own
algorithmic shape, not a generator artifact.

Per-table treatment (scale ratios follow the driver's own observed
per-decade scaling, TESTDATA.md):
- region/nation: fixed (copied verbatim).
- customer/supplier/part/orders/lineitem/events: 10 copies; every
  primary and foreign key shifted by copy * KEY_STRIDE consistently, so
  referential integrity holds within each copy and no key collides
  across copies. Timestamps, prices, flags unchanged (same time range
  => per-copy temporal density matches sf0.1, users are copy-disjoint).
- documents: 10 copies, doc_id shifted; for copy i>0 every TOKEN gets a
  'c{i}' suffix: intra-copy exact/near-duplicate structure (shingles,
  8-gram spans, simhash features) is preserved exactly, while copies
  share zero tokens/shingles — no cross-copy duplicate pairs are
  manufactured. n_chars recomputed from the rewritten text.
- embeddings: 4 copies (mirrors the driver's 4x-per-decade trend for
  this table and keeps the deliberately-quadratic exact-oracle twins
  bounded); copy i applies a seeded signed coordinate permutation — an
  orthogonal transform, so ALL intra-copy cosines/geometry are
  preserved bit-for-bit in distribution, while cross-copy cosines
  collapse to ~0 in d=64 (no cross-copy near-dup pairs).

Output parquet is written by DuckDB with default row groups (~122k
rows), so Spark's scan parallelizes across row groups. Everything is
seeded/arithmetic — two runs produce identical files.

Usage: python tools/gen_scale.py [dst] [--copies N] [--src DIR]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import duckdb
import numpy as np

KEY_STRIDE = 10_000_000  # > any sf0.1 key (max observed 149,999)
EMBED_COPIES = 4  # driver's embeddings table scales ~4x per decade


def _copy_expr(table: str) -> str:
    """SELECT list for one key-shifted copy; `i` is the copy index."""
    shift = lambda c: f"{c} + i * {KEY_STRIDE} AS {c}"  # noqa: E731
    if table == "lineitem":
        keys = {"l_orderkey", "l_partkey", "l_suppkey"}
        cols = (
            "l_orderkey l_partkey l_suppkey l_linenumber l_quantity "
            "l_extendedprice l_discount l_tax l_returnflag l_linestatus "
            "l_shipdate"
        ).split()
    elif table == "orders":
        keys = {"o_orderkey", "o_custkey"}
        cols = (
            "o_orderkey o_custkey o_orderstatus o_totalprice o_orderdate "
            "o_orderpriority"
        ).split()
    elif table == "customer":
        keys = {"c_custkey"}
        cols = "c_custkey c_name c_nationkey c_acctbal c_mktsegment".split()
    elif table == "supplier":
        keys = {"s_suppkey"}
        cols = "s_suppkey s_name s_nationkey s_acctbal".split()
    elif table == "part":
        keys = {"p_partkey"}
        cols = "p_partkey p_name p_brand p_type p_size p_retailprice".split()
    elif table == "events":
        keys = {"event_id", "user_id"}
        cols = "event_id ts user_id event_type value props".split()
    else:
        raise ValueError(table)
    return ", ".join(shift(c) if c in keys else c for c in cols)


def gen_relational(con, src: str, dst: str, copies: int) -> None:
    for table in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        con.execute(
            f"COPY (SELECT {_copy_expr(table)} "
            f"FROM '{src}/{table}.parquet', range({copies}) t(i) "
            f"ORDER BY i) TO '{dst}/{table}.parquet' (FORMAT parquet)"
        )
    for table in ("region", "nation"):
        shutil.copyfile(f"{src}/{table}.parquet", f"{dst}/{table}.parquet")


def gen_documents(con, src: str, dst: str, copies: int) -> None:
    # token-suffix rewrite: every token of copy i>0 becomes token||'c{i}',
    # so shingle/gram/vocab spaces are disjoint across copies while every
    # intra-copy relationship (exact dup, near-dup, span dup) is intact
    con.execute(
        f"""
        COPY (
          SELECT doc_id + i * {KEY_STRIDE} AS doc_id,
                 CASE WHEN i = 0 THEN text
                      ELSE array_to_string(
                             list_transform(string_split(text, ' '),
                                            t -> t || 'c' || i::VARCHAR), ' ')
                 END AS text,
                 lang, source,
                 CASE WHEN i = 0 THEN n_chars
                      ELSE length(array_to_string(
                             list_transform(string_split(text, ' '),
                                            t -> t || 'c' || i::VARCHAR), ' '))
                 END AS n_chars
          FROM '{src}/documents.parquet', range({copies}) t(i)
          ORDER BY i
        ) TO '{dst}/documents.parquet' (FORMAT parquet)
        """
    )


def gen_embeddings(src: str, dst: str, copies: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{src}/embeddings.parquet")
    vec_id = tbl.column("vec_id").to_numpy()
    label = tbl.column("label").to_numpy()
    emb = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    d = emb.shape[1]
    ids, labs, vecs = [], [], []
    for i in range(copies):
        rng = np.random.default_rng(1000 + i)
        perm = rng.permutation(d)
        signs = rng.choice([-1.0, 1.0], size=d).astype(np.float32)
        ids.append(vec_id + i * KEY_STRIDE)
        labs.append(label)
        # signed permutation = orthogonal: intra-copy cosines preserved
        vecs.append(emb[:, perm] * signs if i else emb)
    out = pa.table(
        {
            "vec_id": np.concatenate(ids),
            "embedding": pa.array(
                [list(map(float, v)) for v in np.concatenate(vecs)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(np.concatenate(labs), type=pa.int32()),
        }
    )
    pq.write_table(out, f"{dst}/embeddings.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dst", nargs="?", default="benchdata/sf1")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--embed-copies", type=int, default=None,
        help="embeddings copies (default min(4, copies) — the driver's "
        "observed ~4x-per-decade trend for this table; sf10 uses 16)",
    )
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    gen_relational(con, args.src, args.dst, args.copies)
    gen_documents(con, args.src, args.dst, args.copies)
    gen_embeddings(args.src, args.dst,
                   args.embed_copies or min(EMBED_COPIES, args.copies))
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        n = con.execute(f"SELECT count(*) FROM '{args.dst}/{t}.parquet'").fetchone()[0]
        print(f"{t:12s} {n:>10,}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
