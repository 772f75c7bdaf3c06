"""Plan gates for the partitioned-parquet sink and the HLL rollup contract.

Scale mechanisms must be visible in the PLAN, not just the results:
 - a literal predicate on the partition column must become a
   PartitionFilter (static pruning — fewer files listed and scanned);
 - a join against a runtime-derived dim must inject a
   dynamicpruningexpression into the fact scan (DPP);
 - HLL union of disjoint shard partials must equal the direct
   single-pass sketch estimate (mergeability is lossless), within ±5%
   of exact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlmc_etl_spark.plans import QUERIES
from tlmc_etl_spark.scratch import scratch_dir
from tlmc_etl_spark.sinks.partitioned import (
    partition_values,
    read_partitioned,
    write_partitioned,
)
from tlmc_etl_spark.sources.tables import load_table


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPartitionedSink:
    def test_write_creates_month_directories(self, spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders")
        fact = orders.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("o_month"), "o_totalprice"
        )
        path = scratch_dir(spark, "prune_gate", sf_dir)
        write_partitioned(fact, path, "o_month")
        vals = partition_values(path)
        assert len(vals) > 12, vals
        assert all(len(v) == 7 and v[4] == "-" for v in vals)

        # static pruning: a literal month filter must land in
        # PartitionFilters, NOT DataFilters (the column isn't in the files)
        back = read_partitioned(spark, path)
        one = back.filter(F.col("o_month") == vals[0])
        plan = _executed_plan(one)
        scan = next(ln for ln in plan.splitlines() if "FileScan" in ln)
        assert "PartitionFilters" in scan
        pf = scan.split("PartitionFilters")[1]
        assert vals[0] in pf.split("DataFilters")[0]
        # and the filtered count matches a raw recompute
        expect = fact.filter(F.col("o_month") == vals[0]).count()
        assert one.count() == expect

    def test_rollup_query_uses_dynamic_partition_pruning(self, spark, sf_dir):
        df = QUERIES["partitioned_month_rollup"].fn(spark, sf_dir)
        plan = _executed_plan(df)
        fact_scans = [
            ln
            for ln in plan.splitlines()
            if "FileScan" in ln and "dynamicpruning" in ln.lower()
        ]
        assert fact_scans, "fact scan lost its dynamicpruningexpression:\n" + plan[:2000]


class TestHllRollupContract:
    def test_union_of_partials_equals_direct_sketch(self, spark, sf_dir):
        # the datasketch variant (the portable-hash SQL-replay form is
        # the primary `hll_user_rollup` since round 14)
        rows = QUERIES["hll_user_rollup_datasketch"].fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["est_merged"] == r["est_direct"], r
            assert abs(r["est_merged"] - r["n_exact"]) <= max(0.05 * r["n_exact"], 1), r
            assert r["sum_shard_users"] >= r["n_exact"]


class TestSortedLayout:
    def _ranges(self, path, col):
        import glob

        import pyarrow.parquet as pq

        ranges = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                ranges.append((st.min, st.max))
        return sorted(ranges)

    @staticmethod
    def _overlap_fraction(ranges):
        overlaps = sum(
            1
            for (a, b) in zip(ranges, ranges[1:])
            if a[1] > b[0]  # this range's max reaches into the next one
        )
        return overlaps / max(len(ranges) - 1, 1)

    def test_sorted_write_makes_row_group_stats_selective(self, spark, sf_dir):
        from tlmc_etl_spark.sinks.partitioned import write_sorted

        orders = load_table(spark, sf_dir, "orders")
        base = scratch_dir(spark, "sorted_layout", sf_dir)
        sorted_path = f"{base}/sorted"
        unsorted_path = f"{base}/unsorted"
        write_sorted(orders, sorted_path, ["o_custkey"])
        orders.repartition(4).write.mode("overwrite").parquet(unsorted_path)

        srt = self._ranges(sorted_path, "o_custkey")
        uns = self._ranges(unsorted_path, "o_custkey")
        assert len(srt) >= 2 and len(uns) >= 2
        # sorted: consecutive row-group key ranges barely touch; unsorted:
        # every row group spans ~the whole key space and all overlap
        assert self._overlap_fraction(srt) <= 0.25, srt
        assert self._overlap_fraction(uns) >= 0.75, uns

        # and the layout round-trips identically
        back = spark.read.parquet(sorted_path)
        assert back.count() == orders.count()
        assert back.agg({"o_totalprice": "sum"}).first()[0] == pytest.approx(
            orders.agg({"o_totalprice": "sum"}).first()[0], rel=1e-12
        )


class TestCompaction:
    def test_small_files_merge_shuffle_free_with_row_parity(self, spark, sf_dir):
        from tlmc_etl_spark.sinks.partitioned import compact_files

        orders = load_table(spark, sf_dir, "orders")
        base = scratch_dir(spark, "compact", sf_dir)
        src, dst = f"{base}/src", f"{base}/dst"
        orders.repartition(32).write.mode("overwrite").parquet(src)  # 32 tiny files

        import glob

        assert len(glob.glob(f"{src}/*.parquet")) == 32
        n = orders.count()
        out_files = compact_files(spark, src, dst, target_rows_per_file=(n + 1) // 2)
        assert out_files == 2
        back = spark.read.parquet(dst)
        assert back.count() == n
        # coalesce must not have shuffled: the compaction plan carries no Exchange
        plan = (
            spark.read.parquet(src)
            .coalesce(2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestZOrderLayout:
    """write_zordered must make row-group min/max selective in BOTH
    dimensions at once. A lexicographic (a, b) sort is the control and
    its failure mode is the point: a is narrow per row group but b spans
    its FULL range inside every a-run, so a predicate on b alone prunes
    nothing — while any contiguous Z-curve range is a near-tile in the
    2-D space, narrow in a AND b (top Morton bits fix both prefixes)."""

    @staticmethod
    def _mean_width(path, col, full):
        """Mean normalized row-group stat width for one dimension: ~1.0
        means a predicate on this column alone skips nothing, small
        means most point/range predicates skip most row groups."""
        import glob

        import pyarrow.parquet as pq

        widths = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                widths.append(min((st.max - st.min + 1) / full, 1.0))
        assert widths
        return sum(widths) / len(widths)

    def test_zorder_is_selective_in_both_dims_where_lex_sort_is_not(
        self, spark, sf_dir
    ):
        from tlmc_etl_spark.scratch import scratch_dir
        from tlmc_etl_spark.sinks.partitioned import write_sorted, write_zordered
        from tlmc_etl_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        # hash-spread keys over the full 0..255 range at every sf (the
        # natural sf0.001 key ranges are far narrower than any modulus)
        li = load_table(spark, sf_dir, "lineitem").select(
            F.pmod(F.xxhash64("l_orderkey"), F.lit(256)).cast("int").alias("a"),
            F.pmod(F.xxhash64("l_partkey", "l_orderkey"), F.lit(256))
            .cast("int")
            .alias("b"),
            "l_quantity",
        )
        base = scratch_dir(spark, "zorder_layout", sf_dir)
        z_path, lex_path = f"{base}/zorder", f"{base}/lex"
        write_zordered(li, z_path, "a", "b", n_files=16)  # bits auto-sized to 8
        write_sorted(li, lex_path, ["a", "b"], n_files=16)

        lex_wa = self._mean_width(lex_path, "a", 256)
        lex_wb = self._mean_width(lex_path, "b", 256)
        z_wa = self._mean_width(z_path, "a", 256)
        z_wb = self._mean_width(z_path, "b", 256)

        # control behaves as documented: selective in a, blind in b
        assert lex_wa <= 0.3, (lex_wa, lex_wb)
        assert lex_wb >= 0.85, (lex_wa, lex_wb)
        # Z layout: BOTH dimensions selective (16 range-split groups fix
        # the top two Morton bits of each dimension, ~quarter-range tiles
        # plus quantile-straddle slop)
        assert z_wa <= 0.7, (z_wa, z_wb)
        assert z_wb <= 0.7, (z_wa, z_wb)
        assert z_wb < 0.8 * lex_wb, (z_wb, lex_wb)

        # and the layout round-trips identically
        back = spark.read.parquet(z_path)
        assert back.count() == li.count()
        assert back.agg(F.sum("l_quantity")).first()[0] == li.agg(
            F.sum("l_quantity")
        ).first()[0]

    def test_undersized_or_negative_keys_refuse_instead_of_silently_truncating(
        self, spark, sf_dir, tmp_path
    ):
        import pytest as _pytest

        from tlmc_etl_spark.sinks.partitioned import write_zordered
        from tlmc_etl_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").cast("int").alias("a"),
            F.col("l_suppkey").cast("int").alias("b"),
        )
        # raw TPC-H keys need more than 5 bits: an explicit undersized
        # width must raise (z_value would drop the high bits and the
        # layout would look fine while skipping nothing)
        with _pytest.raises(ValueError, match="silently drop high bits"):
            write_zordered(li, str(tmp_path / "z1"), "a", "b", bits=5)
        with _pytest.raises(ValueError, match="non-negative"):
            write_zordered(
                li.withColumn("a", -F.col("a")), str(tmp_path / "z2"), "a", "b"
            )
