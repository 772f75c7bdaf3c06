"""Cached healing enrichment stage (operators/heal.py): idempotent cache
merge, one-heal-per-distinct-template, pluggable healer, provenance.

Reference contract: lyrics_formatter.py's AI healing layer behind
AdvancedCache's hashed-id cache, with the strip-code fallback when
healing is disabled (ENABLE_AI_HEALING=0)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlmc_etl_spark.operators.heal import heal_enrich, standin_heal


@pytest.fixture()
def bronze(spark):
    # 6 lines over 3 distinct templates (2 lines each)
    rows = []
    for i in range(3):
        for line in range(2):
            rows.append((i * 10 + line, f"{{{{tpl{i}|arg {i}|x}}}}"))
    return spark.createDataFrame(rows, "line_id long, raw_text string")


def empty_cache(spark):
    return spark.createDataFrame([], "cache_key long, healed_text string")


def test_standin_heal_strips_code(spark):
    df = spark.createDataFrame(
        [("{{ruby|body 1|anno}}",), ("{{broken|payload 2",), ("{{lone}}",)],
        "raw_text string",
    )
    got = [r["h"] for r in df.select(standin_heal(F.col("raw_text")).alias("h")).collect()]
    assert got == ["body 1 anno", "payload 2", "lone"]


def test_cold_run_heals_misses_with_provenance(spark, bronze):
    healed, cache = heal_enrich(bronze, empty_cache(spark))
    rows = healed.collect()
    assert len(rows) == 6
    assert all(r["healed_by"] == "standin" and r["need_review"] for r in rows)
    assert all(r["healed_text"].startswith("arg ") for r in rows)
    # cache holds one row per DISTINCT template, not per line
    assert cache.count() == 3


def test_second_run_is_all_cache_hits_and_cache_is_fixed_point(spark, bronze):
    _, cache1 = heal_enrich(bronze, empty_cache(spark))
    cache1 = cache1.localCheckpoint(eager=True)
    healed2, cache2 = heal_enrich(bronze, cache1)
    rows = healed2.collect()
    assert all(r["healed_by"] == "cache" and not r["need_review"] for r in rows)
    assert sorted(map(tuple, cache2.collect())) == sorted(map(tuple, cache1.collect()))


def test_cache_wins_over_recompute(spark, bronze):
    from tlmc_etl_spark.operators.dedup import portable_hash60

    # seed ONE template with a curated healed text the stand-in cannot
    # produce; the other two templates heal fresh
    seed = (
        bronze.filter("line_id = 0")
        .select(
            portable_hash60(F.col("raw_text")).alias("cache_key"),
            F.lit("CURATED").alias("healed_text"),
        )
        .distinct()
    )
    healed, cache = heal_enrich(bronze, seed)
    by_line = {r["line_id"]: r for r in healed.collect()}
    for line in (0, 1):  # both lines of template 0 hit the seed
        assert by_line[line]["healed_text"] == "CURATED"
        assert by_line[line]["healed_by"] == "cache"
        assert not by_line[line]["need_review"]
    assert by_line[10]["healed_by"] == "standin"
    # merge keeps the curated row, never overwrites it with a recompute
    kept = {r["cache_key"]: r["healed_text"] for r in cache.collect()}
    seed_key = seed.first()["cache_key"]
    assert kept[seed_key] == "CURATED"
    assert len(kept) == 3


def test_pluggable_healer_called_once_per_distinct_template(spark, bronze):
    calls = spark.sparkContext.accumulator(0)

    @F.udf("string")
    def llm_standin(raw: str) -> str:
        calls.add(1)
        return f"LLM({raw})"

    healed, cache = heal_enrich(
        bronze, empty_cache(spark), heal=lambda c: llm_standin(c), healer_name="llm"
    )
    rows = healed.collect()
    cache_rows = cache.collect()
    assert all(r["healed_by"] == "llm" for r in rows)
    assert all(r["healed_text"].startswith("LLM(") for r in rows)
    assert len(cache_rows) == 3
    # 6 lines, 3 distinct templates: the healer ran EXACTLY once per
    # distinct template — the eager checkpoint inside heal_enrich stops
    # the output join and the cache merge from re-evaluating the heal
    # (a nondeterministic LLM healer must see one call per template,
    # and the cache row must be the same value the output carried)
    assert calls.value == 3, f"healer ran {calls.value}x for 3 templates"


def test_null_raw_rows_are_preserved_and_never_cached(spark):
    rows = [(1, "{{a|x}}"), (2, None), (3, "{{b|y}}")]
    bronze = spark.createDataFrame(rows, "line_id long, raw_text string")
    healed, cache = heal_enrich(bronze, empty_cache(spark))
    got = {r["line_id"]: r for r in healed.collect()}
    assert sorted(got) == [1, 2, 3], "enrichment must be row-preserving"
    assert got[2]["healed_text"] is None and got[2]["need_review"]
    keys = [r["cache_key"] for r in cache.collect()]
    assert None not in keys and len(keys) == 2


def test_failed_heal_is_emitted_but_never_poisons_the_cache(spark, bronze):
    @F.udf("string")
    def failing_heal(raw: str) -> str:
        # the real LLM case: one template's API call fails -> NULL
        return None if "tpl0" in raw else f"LLM({raw})"

    healed1, cache1 = heal_enrich(
        bronze, empty_cache(spark), heal=lambda c: failing_heal(c), healer_name="llm"
    )
    # the failure is visible this run (need_review), not silently dropped
    failed = [r for r in healed1.collect() if r["healed_text"] is None]
    assert len(failed) == 2 and all(r["need_review"] for r in failed)
    # ...but never persisted: the cache holds only the 2 successful heals
    cache1 = cache1.localCheckpoint(eager=True)
    assert cache1.filter(F.col("healed_text").isNull()).count() == 0
    assert cache1.count() == 2
    # a later run with a recovered healer REPAIRS the key (the poisoned-
    # cache bug: a cached NULL used to win the merge forever)
    healed2, cache2 = heal_enrich(bronze, cache1)
    assert all(r["healed_text"] is not None for r in healed2.collect())
    assert cache2.count() == 3


def test_nondeterministic_healer_output_matches_cache(spark, bronze):
    """An LLM healer is nondeterministic call-to-call. The contract: the
    healed_text emitted to consumers and the healed_text persisted in
    the cache are THE SAME VALUE (one materialization), never two
    independent draws."""
    import uuid

    @F.udf("string")
    def flaky_heal(raw: str) -> str:
        return f"{raw}::{uuid.uuid4().hex}"

    healed, cache = heal_enrich(
        bronze, empty_cache(spark), heal=lambda c: flaky_heal(c), healer_name="llm"
    )
    by_key = {r["cache_key"]: r["healed_text"] for r in cache.collect()}
    for r in healed.collect():
        assert r["healed_text"] == by_key[r["cache_key"]], (
            "output and cache diverged for one template — the heal was "
            "evaluated more than once"
        )


def test_hash_collision_does_not_duplicate_or_cross_assign(spark, monkeypatch):
    """Two DISTINCT raw texts that collide under the content hash must
    not duplicate the colliding missed rows or hand one template's
    healed text to the other (review finding: the miss join used to key
    on cache_key alone while distinct_missed kept both raw values under
    the one key). Forced by patching the hash to a constant."""
    import tlmc_etl_spark.operators.heal as heal_mod

    monkeypatch.setattr(
        heal_mod, "portable_hash60", lambda c: F.lit(7).cast("long")
    )
    rows = [(1, "{{a|left}}"), (2, "{{b|right}}")]
    bronze = spark.createDataFrame(rows, "line_id long, raw_text string")
    healed, cache = heal_enrich(bronze, empty_cache(spark))
    got = sorted(healed.collect(), key=lambda r: r["line_id"])
    assert len(got) == 2, "colliding keys must not duplicate missed rows"
    assert got[0]["healed_text"] == "left"
    assert got[1]["healed_text"] == "right"
    # the hashed cache itself can only keep one value per key — that is
    # inherent to a hash-keyed cache; the merge must still be a single
    # deterministic row, not two
    assert cache.count() == 1


def test_null_raw_provenance_is_not_the_healer(spark):
    """A NULL raw row runs no healer, so healed_by must be NULL — not
    the healer's name (review finding: provenance accounting counted
    these rows as healer output)."""
    bronze = spark.createDataFrame(
        [(1, None), (2, "{{a|x}}")], "line_id long, raw_text string"
    )
    healed, _ = heal_enrich(bronze, empty_cache(spark), healer_name="llm")
    got = {r["line_id"]: r for r in healed.collect()}
    assert got[1]["healed_by"] is None and got[1]["need_review"]
    assert got[2]["healed_by"] == "llm"
