"""Local oracle-parity harness — mirrors the driver's CORRECTNESS check.

Runs every registered query on Spark and its oracle SQL on DuckDB at the
given scale factor, sorts columns by name and rows by value, and compares.
Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from tlmc_etl_spark.plans import QUERIES  # noqa: E402
from tlmc_etl_spark.session import get_spark  # noqa: E402
from tlmc_etl_spark.sources.tables import TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        # unify int flavors / nullable ints
        if str(df[c].dtype).lower().startswith(("int", "uint")):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def dtype_kind(series: pd.Series) -> str:
    if pd.api.types.is_integer_dtype(series):
        return "int"
    if pd.api.types.is_float_dtype(series):
        return "float"
    return "other"


def compare(name: str, s: pd.DataFrame, d: pd.DataFrame) -> str:
    if sorted(s.columns) != sorted(d.columns):
        return f"SCHEMA spark={sorted(s.columns)} duck={sorted(d.columns)}"
    if len(s) != len(d):
        return f"ROWS spark={len(s)} duck={len(d)}"
    # The driver hashes stringified cells, so an int column on one engine vs a
    # float column on the other ("15441" vs "15441.0") is a real failure even
    # when the values are numerically equal. DuckDB's sum(BIGINT) → HUGEINT →
    # float64 fetch is the classic case (copy_binary_export, round 3). Flag it
    # here instead of coercing it away.
    for c in s.columns:
        ks, kd = dtype_kind(s[c]), dtype_kind(d[c])
        if {ks, kd} == {"int", "float"}:
            return f"DTYPE col={c} spark={s[c].dtype} duck={d[c].dtype} (driver hash would diverge)"
    sn, dn = normalize(s.copy()), normalize(d.copy())
    for c in sn.columns:
        a, b = sn[c], dn[c]
        if a.dtype == "float64" or b.dtype == "float64":
            aa = pd.to_numeric(a, errors="coerce")
            bb = pd.to_numeric(b, errors="coerce")
            bad = ~((aa.isna() & bb.isna()) | (abs(aa - bb) <= 1e-9))
        else:
            bad = ~((a.isna() & b.isna()) | (a == b))
        if bad.any():
            i = bad.idxmax()
            return f"VALUES col={c} row={i} spark={a[i]!r} duck={b[i]!r}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("oracle-check")

    cons: dict[str, duckdb.DuckDBPyConnection] = {}

    def con_for(d: str) -> duckdb.DuckDBPyConnection:
        if d not in cons:
            c = duckdb.connect()
            for t in TABLES:
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
            cons[d] = c
        return cons[d]

    failures = 0
    for name in names:
        q = QUERIES[name]
        # literal-pinned oracles (trained artifacts embedded as SQL
        # literals) are value-valid only at their generation sf — run
        # BOTH engines there, whatever dir the CLI asked for
        run_dir = q.oracle_sf_dir or sf_dir
        con = con_for(run_dir)
        pinned = " [pinned sf]" if run_dir != sf_dir else ""
        try:
            sdf = q.fn(spark, run_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:30s} SPARK-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if q.oracle is None:
            print(f"{name:30s} ext (rows={len(sdf)})")
            continue
        try:
            ddf = con.execute(q.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name:30s} DUCK-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        verdict = compare(name, sdf, ddf)
        print(f"{name:30s} {verdict} (rows={len(sdf)}){pinned}")
        if verdict != "OK":
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
