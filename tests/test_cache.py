"""Memoized-fetch cache operators (operators/cache.py): key normalization,
hit/restore/miss classification, fetch-dedup, and the property the whole
design exists for — resolve+commit is idempotent, and a second run over
the committed state fetches nothing (Cache.py:24-110 semantics).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlmc_etl_spark.operators.cache import (
    cache_commit,
    cache_key_from_url,
    cache_resolve,
    normalize_cache_path,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestKeyNormalization:
    def test_hostile_chars_replaced_and_path_decoded(self, spark):
        row = (
            spark.range(1)
            .select(
                cache_key_from_url(
                    "thwiki",
                    F.lit("https://w.example.org/wiki/A%20B%3CC%3E?action=raw"),
                ).alias("k")
            )
            .first()
        )
        # path '/wiki/A B<C>' -> '/', '<', '>' all substituted
        assert row["k"] == "thwiki___wiki_A B_C_"

    def test_normalize_matches_reference_char_class(self, spark):
        got = (
            spark.range(1)
            .select(normalize_cache_path(F.lit('a<b>c:d"e/f\\g|h?i*j')).alias("n"))
            .first()["n"]
        )
        assert got == "a_b_c_d_e_f_g_h_i_j"


class TestResolveStates:
    @pytest.fixture()
    def state(self, spark):
        requests = _df(
            spark,
            [("hit",), ("hit",), ("dead",), ("carried",), ("new",)],
            "cache_key string",
        )
        index = _df(
            spark,
            [("hit", True), ("dead", False)],
            "cache_key string, file_ok boolean",
        )
        store = _df(spark, [("hit",), ("carried",)], "cache_key string")
        return requests, index, store

    def test_states_and_fetch_dedup(self, spark, state):
        requests, index, store = state
        got = {r["cache_key"]: r["status"] for r in cache_resolve(requests, index, store).collect()}
        assert got == {
            "hit": "hit",          # index row + live file
            "dead": "miss",        # index row, file gone -> refetch
            "carried": "restored", # file present, index row missing -> no fetch
            "new": "miss",
        }
        n = cache_resolve(requests, index, store).count()
        assert n == 4, "duplicate requests must collapse to one row per key"

    def test_second_run_after_commit_is_all_hits(self, spark, state):
        requests, index, store = state
        resolved = cache_resolve(requests, index, store)
        index2 = cache_commit(index, resolved)
        # the fetch/restore wrote payloads for every non-hit key
        store2 = store.unionByName(
            resolved.filter(F.col("status") != "hit").select("cache_key")
        ).distinct()
        second = cache_resolve(requests, index2, store2)
        assert {r["status"] for r in second.collect()} == {"hit"}

    def test_commit_is_idempotent(self, spark, state):
        requests, index, store = state
        resolved = cache_resolve(requests, index, store)
        once = cache_commit(index, resolved)
        twice = cache_commit(once, cache_resolve(requests, once, store))
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
