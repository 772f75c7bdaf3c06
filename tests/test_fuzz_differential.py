"""Property-based differential fuzzing: random (filter, group, agg)
specs compiled BOTH to a Spark DataFrame plan and to DuckDB SQL, full
results compared.

The named oracle queries pin ~100 hand-written plans; this fuzzes the
space between them — operator composition, predicate edge values, empty
groups, null-producing aggregates — so a semantics drift in the shared
column algebra (rounding, comparison, grouping of NULLs) fails loudly
even for shapes no named query exercises. Sums/avgs compare with 1e-9
relative tolerance (both engines fold doubles in arbitrary order);
counts/mins/maxes compare exactly.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tlmc_etl_spark.sources.tables import load_table

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]

filters = st.one_of(
    st.tuples(st.just("price_gt"), st.floats(0, 600000, allow_nan=False, width=32)),
    st.tuples(st.just("price_le"), st.floats(0, 600000, allow_nan=False, width=32)),
    st.tuples(st.just("prio_in"), st.sets(st.sampled_from(PRIORITIES), min_size=1, max_size=4)),
    st.tuples(st.just("status_eq"), st.sampled_from(STATUSES)),
    st.tuples(st.just("mod_eq"), st.tuples(st.integers(2, 13), st.integers(0, 12))),
)

specs = st.fixed_dictionaries(
    {
        "filters": st.lists(filters, min_size=0, max_size=3),
        "group": st.sampled_from([None, "o_orderstatus", "o_orderpriority"]),
        "aggs": st.sets(
            st.sampled_from(["cnt", "total", "mn", "mx", "avg_p"]), min_size=1, max_size=4
        ),
        "having_cnt_gt": st.one_of(st.none(), st.integers(0, 5000)),
    }
)


def _spark_query(orders, spec):
    df = orders
    for kind, arg in spec["filters"]:
        if kind == "price_gt":
            df = df.filter(F.col("o_totalprice") > float(arg))
        elif kind == "price_le":
            df = df.filter(F.col("o_totalprice") <= float(arg))
        elif kind == "prio_in":
            df = df.filter(F.col("o_orderpriority").isin(*sorted(arg)))
        elif kind == "status_eq":
            df = df.filter(F.col("o_orderstatus") == arg)
        elif kind == "mod_eq":
            k, r = arg
            df = df.filter(F.pmod(F.col("o_custkey"), F.lit(k)) == r % k)
    agg_map = {
        "cnt": F.count(F.lit(1)).alias("cnt"),
        "total": F.sum("o_totalprice").alias("total"),
        "mn": F.min("o_totalprice").alias("mn"),
        "mx": F.max("o_totalprice").alias("mx"),
        "avg_p": F.avg("o_totalprice").alias("avg_p"),
    }
    aggs = [agg_map[a] for a in sorted(spec["aggs"])]
    if spec["group"]:
        out = df.groupBy(spec["group"]).agg(*aggs, F.count(F.lit(1)).alias("__n"))
        if spec.get("having_cnt_gt") is not None:
            out = out.filter(F.col("__n") > spec["having_cnt_gt"])
        return out.drop("__n")
    return df.agg(*aggs)


def _duck_sql(spec):
    conds = []
    for kind, arg in spec["filters"]:
        if kind == "price_gt":
            conds.append(f"o_totalprice > {float(arg)!r}")
        elif kind == "price_le":
            conds.append(f"o_totalprice <= {float(arg)!r}")
        elif kind == "prio_in":
            vals = ", ".join(f"'{v}'" for v in sorted(arg))
            conds.append(f"o_orderpriority IN ({vals})")
        elif kind == "status_eq":
            conds.append(f"o_orderstatus = '{arg}'")
        elif kind == "mod_eq":
            k, r = arg
            conds.append(f"o_custkey % {k} = {r % k}")
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    agg_map = {
        "cnt": "count(*) AS cnt",
        "total": "sum(o_totalprice) AS total",
        "mn": "min(o_totalprice) AS mn",
        "mx": "max(o_totalprice) AS mx",
        "avg_p": "avg(o_totalprice) AS avg_p",
    }
    sel = ", ".join(agg_map[a] for a in sorted(spec["aggs"]))
    if spec["group"]:
        g = spec["group"]
        having = (
            f" HAVING count(*) > {spec['having_cnt_gt']}"
            if spec.get("having_cnt_gt") is not None
            else ""
        )
        return f"SELECT {g}, {sel} FROM orders{where} GROUP BY {g}{having}"
    return f"SELECT {sel} FROM orders{where}"


def _normalize(rows, group):
    out = []
    for r in rows:
        d = dict(zip(r.keys(), r.values())) if hasattr(r, "keys") else r.asDict()
        out.append(d)
    key = (lambda d: (d[group] is None, d[group])) if group else (lambda d: 0)
    return sorted(out, key=key)


def _assert_equal(spark_rows, duck_rows, group):
    assert len(spark_rows) == len(duck_rows)
    for s, d in zip(spark_rows, duck_rows):
        assert set(s) == set(d)
        for col in s:
            sv, dv = s[col], d[col]
            if sv is None or dv is None:
                assert sv is None and dv is None, (col, sv, dv)
            elif isinstance(sv, float) and col in ("total", "avg_p"):
                assert math.isclose(sv, dv, rel_tol=1e-9, abs_tol=1e-6), (col, sv, dv)
            else:
                assert sv == dv, (col, sv, dv)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=specs)
def test_random_filter_group_agg_matches_duckdb(spark, duck, sf_dir, spec):
    orders = load_table(spark, sf_dir, "orders")
    got = _normalize(
        [r.asDict() for r in _spark_query(orders, spec).collect()], spec["group"]
    )
    cur = duck.execute(_duck_sql(spec))
    cols = [d[0] for d in cur.description]
    want = _normalize([dict(zip(cols, row)) for row in cur.fetchall()], spec["group"])
    _assert_equal(got, want, spec["group"])


# ---------------------------------------------------------------------------
# Window-function fuzzing: random (partition, function) specs, total
# per-partition order pinned by (o_totalprice DESC, o_orderkey) so every
# ranking/offset/running result is deterministic in both engines.
# ---------------------------------------------------------------------------

window_specs = st.fixed_dictionaries(
    {
        "part": st.sampled_from(["o_orderstatus", "o_orderpriority"]),
        "fn": st.sampled_from(["row_number", "rank", "dense_rank", "lag", "lead", "cumsum", "range_sum"]),
        "limit_filter": st.integers(1, 20),
    }
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=window_specs)
def test_random_window_function_matches_duckdb(spark, duck, sf_dir, spec):
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy(spec["part"]).orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    fns = {
        "row_number": F.row_number().over(w),
        "rank": F.rank().over(w),
        "dense_rank": F.dense_rank().over(w),
        "lag": F.lag("o_totalprice", 1).over(w),
        "lead": F.lead("o_totalprice", 1).over(w),
        "cumsum": F.sum("o_totalprice").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
        # RANGE frame over a value ordering: peers (equal prices) enter the
        # frame together — the semantics ROWS frames cannot express
        "range_sum": F.sum("o_totalprice").over(
            W.partitionBy(spec["part"])
            .orderBy("o_totalprice")
            .rangeBetween(-50000, 0)
        ),
    }
    got = (
        orders.select(
            "o_orderkey", F.col(spec["part"]).alias("part"), fns[spec["fn"]].alias("v")
        )
        .filter(F.col("o_orderkey") % spec["limit_filter"] == 0)
        .collect()
    )
    sql_fns = {
        "row_number": "row_number() OVER win",
        "rank": "rank() OVER win",
        "dense_rank": "dense_rank() OVER win",
        "lag": "lag(o_totalprice, 1) OVER win",
        "lead": "lead(o_totalprice, 1) OVER win",
        "cumsum": "sum(o_totalprice) OVER (PARTITION BY {p} ORDER BY o_totalprice DESC,"
        " o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
        "range_sum": "sum(o_totalprice) OVER (PARTITION BY {p} ORDER BY o_totalprice"
        " RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)",
    }
    expr = sql_fns[spec["fn"]].format(p=spec["part"])
    rows = duck.execute(
        f"""
        SELECT o_orderkey, {spec['part']} AS part, {expr} AS v
        FROM (SELECT * FROM orders)
        WINDOW win AS (PARTITION BY {spec['part']}
                       ORDER BY o_totalprice DESC, o_orderkey)
        QUALIFY o_orderkey % {spec['limit_filter']} = 0
        """
    ).fetchall()
    want = {r[0]: (r[1], r[2]) for r in rows}
    assert len(got) == len(want)
    for r in got:
        wp, wv = want[r["o_orderkey"]]
        assert r["part"] == wp
        if isinstance(r["v"], float) and wv is not None:
            assert math.isclose(r["v"], wv, rel_tol=1e-9, abs_tol=1e-6)
        else:
            assert r["v"] == wv, (r, wv)


# ---------------------------------------------------------------------------
# Join fuzzing: orders x customer (broadcast dim), random join type +
# post-join aggregation, vs DuckDB.
# ---------------------------------------------------------------------------

join_specs = st.fixed_dictionaries(
    {
        "how": st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
        "bal_gt": st.floats(-900, 9000, allow_nan=False, width=32),
        "group": st.sampled_from(["o_orderstatus", "o_orderpriority"]),
    }
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=join_specs)
def test_random_join_agg_matches_duckdb(spark, duck, sf_dir, spec):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > float(spec["bal_gt"])
    )
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, spec["how"]
    )
    got = {
        r[spec["group"]]: r["cnt"]
        for r in joined.groupBy(spec["group"]).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    dim = f"(SELECT * FROM customer WHERE c_acctbal > {float(spec['bal_gt'])!r})"
    if spec["how"] in ("inner", "left"):
        jt = "JOIN" if spec["how"] == "inner" else "LEFT JOIN"
        sql = (
            f"SELECT {spec['group']} AS g, count(*) AS cnt FROM orders "
            f"{jt} {dim} c ON o_custkey = c.c_custkey GROUP BY g"
        )
    elif spec["how"] == "left_semi":
        sql = (
            f"SELECT {spec['group']} AS g, count(*) AS cnt FROM orders "
            f"WHERE o_custkey IN (SELECT c_custkey FROM {dim}) GROUP BY g"
        )
    else:
        sql = (
            f"SELECT {spec['group']} AS g, count(*) AS cnt FROM orders "
            f"WHERE o_custkey NOT IN (SELECT c_custkey FROM {dim}) GROUP BY g"
        )
    want = {r[0]: r[1] for r in duck.execute(sql).fetchall()}
    assert got == want, (spec, got, want)


# ---------------------------------------------------------------------------
# Scalar expression fuzzing: string/date functions the catalog leans on
# (regexp_extract, substring, upper/lower, date_trunc/parts) — same spec
# compiled to both engines, row-level compare keyed by o_orderkey.
# ---------------------------------------------------------------------------

scalar_specs = st.fixed_dictionaries(
    {
        "fn": st.sampled_from(
            ["substr", "upper_concat", "regex_digits", "date_part", "date_trunc_month"]
        ),
        "a": st.integers(1, 6),
        "b": st.integers(1, 8),
        "mod": st.integers(5, 40),
    }
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=scalar_specs)
def test_random_scalar_expression_matches_duckdb(spark, duck, sf_dir, spec):
    a, b = spec["a"], spec["b"]
    fn = spec["fn"]
    spark_exprs = {
        "substr": F.substring("o_orderpriority", a, b),
        "upper_concat": F.upper(F.concat_ws(":", "o_orderstatus", "o_orderpriority")),
        "regex_digits": F.regexp_extract("o_orderpriority", r"(\d+)", 1),
        "date_part": F.year("o_orderdate") * 100 + F.month("o_orderdate"),
        "date_trunc_month": F.date_format(
            F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd"
        ),
    }
    duck_exprs = {
        "substr": f"substr(o_orderpriority, {a}, {b})",
        "upper_concat": "upper(concat_ws(':', o_orderstatus, o_orderpriority))",
        "regex_digits": "coalesce(regexp_extract(o_orderpriority, '(\\d+)', 1), '')",
        "date_part": "year(o_orderdate) * 100 + month(o_orderdate)",
        "date_trunc_month": "strftime(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)), '%Y-%m-%d')",
    }
    orders = load_table(spark, sf_dir, "orders")
    got = {
        r["o_orderkey"]: r["v"]
        for r in orders.filter(F.col("o_orderkey") % spec["mod"] == 0)
        .select("o_orderkey", spark_exprs[fn].alias("v"))
        .collect()
    }
    want = dict(
        duck.execute(
            f"SELECT o_orderkey, {duck_exprs[fn]} AS v FROM orders "
            f"WHERE o_orderkey % {spec['mod']} = 0"
        ).fetchall()
    )
    assert got == want, (fn, {k: (got[k], want[k]) for k in list(got)[:3]})


# ---------------------------------------------------------------------------
# Set-operation fuzzing: union / except / intersect / distinct over two
# randomly-filtered projections of orders — completes the declared T2
# surface (SURVEY §2.11) under generated specs.
# ---------------------------------------------------------------------------

setop_specs = st.fixed_dictionaries(
    {
        "op": st.sampled_from(["union_all", "union_distinct", "except", "intersect"]),
        "m1": st.integers(2, 9),
        "m2": st.integers(2, 9),
        "col": st.sampled_from(["o_orderstatus", "o_orderpriority"]),
    }
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=setop_specs)
def test_random_set_operation_matches_duckdb(spark, duck, sf_dir, spec):
    orders = load_table(spark, sf_dir, "orders")
    col, m1, m2 = spec["col"], spec["m1"], spec["m2"]
    a = orders.filter(F.col("o_orderkey") % m1 == 0).select("o_orderkey", col)
    b = orders.filter(F.col("o_orderkey") % m2 == 0).select("o_orderkey", col)
    if spec["op"] == "union_all":
        res = a.unionByName(b)
    elif spec["op"] == "union_distinct":
        res = a.unionByName(b).distinct()
    elif spec["op"] == "except":
        res = a.exceptAll(b)
    else:
        res = a.intersectAll(b)
    got = sorted((r["o_orderkey"], r[col]) for r in res.collect())

    sa = f"SELECT o_orderkey, {col} FROM orders WHERE o_orderkey % {m1} = 0"
    sb = f"SELECT o_orderkey, {col} FROM orders WHERE o_orderkey % {m2} = 0"
    duck_op = {
        "union_all": "UNION ALL",
        "union_distinct": "UNION",
        "except": "EXCEPT ALL",
        "intersect": "INTERSECT ALL",
    }[spec["op"]]
    want = sorted(duck.execute(f"({sa}) {duck_op} ({sb})").fetchall())
    assert got == want, (spec, len(got), len(want))


# ---------------------------------------------------------------------------
# Higher-order array-expression fuzzing: random pipelines of
# transform/filter/sort/slice over the documents word arrays, collapsed
# to a per-doc scalar and compared exactly. This is the expression
# family the dedup/LSH/packing plans lean on hardest (JVM higher-order
# lambdas on one side, DuckDB list_* on the other) and the one the five
# original families never touched. `distinct` is always paired with an
# immediate sort in BOTH engines: first-occurrence order of
# array_distinct vs list_distinct is not a contract either engine
# documents, and no plan in the repo relies on it.
# ---------------------------------------------------------------------------

array_ops = st.lists(
    st.one_of(
        st.just(("upper",)),
        st.tuples(st.just("len_ge"), st.integers(1, 8)),
        st.just(("distinct_sorted",)),
        st.just(("sort",)),
        st.tuples(st.just("prefix"), st.integers(1, 12)),
    ),
    min_size=0,
    max_size=3,
)

array_specs = st.fixed_dictionaries(
    {
        "ops": array_ops,
        "terminal": st.sampled_from(["size", "total_len", "first", "joined"]),
    }
)


def _spark_array_expr(spec):
    col = F.split(F.col("text"), " ")
    for op in spec["ops"]:
        if op[0] == "upper":
            col = F.transform(col, lambda x: F.upper(x))
        elif op[0] == "len_ge":
            k = op[1]
            col = F.filter(col, lambda x: F.length(x) >= k)
        elif op[0] == "distinct_sorted":
            col = F.array_sort(F.array_distinct(col))
        elif op[0] == "sort":
            col = F.array_sort(col)
        elif op[0] == "prefix":
            col = F.slice(col, 1, op[1])
    t = spec["terminal"]
    if t == "size":
        return F.size(col).cast("long")
    if t == "total_len":
        return F.aggregate(
            col, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
    if t == "first":
        return F.try_element_at(col, F.lit(1))
    return F.concat_ws("-", col)


def _duck_array_expr(spec):
    e = "string_split(text, ' ')"
    for op in spec["ops"]:
        if op[0] == "upper":
            e = f"list_transform({e}, x -> upper(x))"
        elif op[0] == "len_ge":
            e = f"list_filter({e}, x -> len(x) >= {op[1]})"
        elif op[0] == "distinct_sorted":
            e = f"list_sort(list_distinct({e}))"
        elif op[0] == "sort":
            e = f"list_sort({e})"
        elif op[0] == "prefix":
            e = f"({e})[1:{op[1]}]"
    t = spec["terminal"]
    if t == "size":
        return f"CAST(len({e}) AS BIGINT)"
    if t == "total_len":
        return f"CAST(coalesce(list_sum(list_transform({e}, x -> len(x))), 0) AS BIGINT)"
    if t == "first":
        return f"({e})[1]"
    return f"coalesce(array_to_string({e}, '-'), '')"


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=array_specs)
def test_random_array_pipeline_matches_duckdb(spark, duck, sf_dir, spec):
    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r["doc_id"], r["v"])
        for r in docs.select("doc_id", _spark_array_expr(spec).alias("v")).collect()
    )
    want = sorted(
        duck.execute(
            f"SELECT doc_id, {_duck_array_expr(spec)} AS v FROM documents"
        ).fetchall()
    )
    assert len(got) == len(want)
    for (gk, gv), (wk, wv) in zip(got, want):
        assert gk == wk
        assert gv == wv, (spec, gk, gv, wv)
