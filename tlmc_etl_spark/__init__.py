"""tlmc_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL system (sqz269/tlmc-etl).

Not a port: the reference is a DAG of ~40 CLI stages (Python/C#) whose inner
loops are relational + vector operators; here each capability is re-expressed
as an idiomatic Spark DataFrame/SQL plan designed for cluster scale
(broadcast joins for small dims, partial aggregation, pushed-down scans,
Arrow-batched pandas UDFs only where built-ins can't express the semantics).

Layout:
    session    — SparkSession builder tuned for local testing / cluster parity
    sources    — table loaders (parquet star schema + JSONL journals)
    functions  — scalar expression helpers (regex metadata, gain math, ids)
    operators  — reusable operator implementations (windows, dedup, vectors)
    plans      — the query catalog: name -> (spark plan, DuckDB oracle SQL)
    streaming  — incremental/journal-resume + structured streaming pieces
"""

__version__ = "0.1.0"
