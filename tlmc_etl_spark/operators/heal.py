"""Cached enrichment ("healing") stage as a table contract.

The reference routes mediawiki templates its rule-based lyrics parser
cannot handle through an LLM healing layer behind a keyed cache
(ThwikiLyricsPageScraper/lyrics_formatter.py:1-3 — "considering using
Chatgpt/Superglue to have a healing layer"; Shared/openai_utils.py;
ExternalInfo/CacheInfoProvider/AdvancedCache.py's hashed-id cache), with
a strip-code + need_review fallback when healing is disabled. The model
call is out-of-engine; what IS engine work — and what this module
implements — is the table contract around it:

  bronze `unparseable` rows
    → cache join on a portable content hash (hits never re-heal)
    → the PLUGGABLE healing function on the DISTINCT missed templates
      (one heal per distinct template, the fetch-dedup groupBy — N lines
      sharing a template must cost one call, not N)
    → healed output with PROVENANCE ('cache' vs the healer's name) and a
      need_review flag on non-cache rows
    → an updated cache table whose merge is idempotent (cache wins over
      recompute; running the stage twice is the identity on the cache
      and turns every row into a hit).

In-container the healer defaults to `standin_heal` — a deterministic
strip-code analogue (drop braces and the template name, join the
argument fields), the same fallback shape the reference runs with
ENABLE_AI_HEALING=0. A real LLM healer plugs in as any Column→Column
callable (e.g. a pandas_udf wrapping the API client); the cache contract
is unchanged.

Scale shape: the cache is a dimension table (distinct templates, not
lines) — it broadcasts; the only wide operation is the distinct on
missed keys, whose input is already the small refused subset.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tlmc_etl_spark.operators.dedup import portable_hash60


def standin_heal(raw: Column) -> Column:
    """Deterministic strip-code stand-in: '{{name|a|b}}' → 'a b'.

    Drops the surrounding braces and the template name, joins the
    remaining pipe-separated argument fields with spaces. Tolerates a
    missing closing brace (the broken-template case); a template with no
    arguments yields its bare name rather than ''."""
    inner = F.regexp_replace(F.regexp_replace(raw, r"^\{\{", ""), r"\}\}$", "")
    # drop the template name (up to and including the first '|'); a
    # pipe-less template keeps the bare name
    args = F.regexp_replace(inner, r"^[^|]*\|", "")
    return F.trim(F.regexp_replace(args, r"\|", " "))


def heal_enrich(
    bronze: DataFrame,
    cache: DataFrame,
    raw_col: str = "raw_text",
    heal: Callable[[Column], Column] | None = None,
    healer_name: str = "standin",
) -> tuple[DataFrame, DataFrame]:
    """Resolve bronze rows through the cache, heal the misses, return
    (healed rows, updated cache).

    `cache` carries (cache_key long, healed_text string). Healed output
    adds cache_key / healed_text / healed_by / need_review to the bronze
    columns. The updated cache is a keyed idempotent merge in which
    EXISTING cache rows win over freshly-healed ones — so re-running the
    stage on its own output cache is the identity on the cache and every
    row resolves 'cache' (the reference decorator's
    row-exists/replace/create dance, declaratively).

    NULL discipline (both reproduced as silent-loss bugs in review):
     - a NULL `raw_col` row is row-PRESERVED: it flows to the output with
       healed_text NULL / need_review true (there is nothing to heal or
       key on), and never touches the cache;
     - a NULL healed_text — a FAILED heal (the real LLM case: API error
       mapped to NULL) — is emitted this run (need_review true) but is
       NEVER persisted: caching a failure would poison the key forever
       (the cache-wins merge would keep the NULL while the row re-heals
       every run, breaking the fixed-point contract AND re-spending the
       API call). NULL cache rows arriving from outside are likewise
       treated as absent.
    """
    if heal is None:
        heal = standin_heal
    # a failed-heal (NULL) cache row must behave as a miss, never a hit
    cache = cache.select("cache_key", "healed_text").filter(
        F.col("cache_key").isNotNull() & F.col("healed_text").isNotNull()
    )
    # persist: the keyed bronze table feeds FOUR consumers (the NULL-raw
    # branch, the cache-hit branch, the miss join's left side, and the
    # distinct-missed subtree materialized by the checkpoint below).
    # Without it each consumer re-evaluates the whole bronze subtree —
    # for the lyrics path that includes the pandas refusal parser, so the
    # corpus-scan + parse ran 4x (the r15 plan audit counted 13
    # ArrowEvalPython nodes / 30 input scans in lyrics_heal_join's plan).
    # Bronze is the refused subset — the contractually small side —
    # and the persist is LRU-evictable (repo-standard reuse-table rule).
    keyed = bronze.withColumn("cache_key", portable_hash60(F.col(raw_col))).persist()
    # healed_by stays NULL here — no healer ran on a NULL raw row, and
    # provenance accounting must not count these as healer output
    null_raw = keyed.filter(F.col(raw_col).isNull()).select(
        "*",
        F.lit(None).cast("string").alias("healed_text"),
        F.lit(None).cast("string").alias("healed_by"),
    )
    keyed = keyed.filter(F.col(raw_col).isNotNull())
    # the cache is distinct-template-sized: broadcast the join
    resolved = keyed.join(F.broadcast(cache), "cache_key", "left")
    hits = resolved.filter(F.col("healed_text").isNotNull()).withColumn(
        "healed_by", F.lit("cache")
    )
    # one heal per DISTINCT missed template (fetch-dedup): N lines that
    # share a template must cost one heal, not N
    missed = resolved.filter(F.col("healed_text").isNull()).drop("healed_text")
    distinct_missed = missed.select("cache_key", raw_col).distinct()
    healed_new = distinct_missed.select(
        "cache_key", raw_col, heal(F.col(raw_col)).alias("healed_text")
    )
    # Materialize ONCE, eagerly: healed_new feeds BOTH the output join
    # and the cache merge — left lazy, a nondeterministic healer (the
    # real LLM case) would run twice per template and could write a
    # cache row that differs from the emitted output (breaking the
    # cache-is-what-you-saw contract and doubling API spend). The
    # checkpoint is distinct-template-sized, not line-sized.
    healed_new = healed_new.localCheckpoint(eager=True)
    # join back on (cache_key, raw_col), not cache_key alone: a
    # portable_hash60 collision between two distinct raw texts must not
    # duplicate the colliding missed rows or cross-assign healed texts
    # (distinct_missed keeps both raw values under the one key)
    miss_rows = missed.join(
        F.broadcast(healed_new), ["cache_key", raw_col]
    ).withColumn("healed_by", F.lit(healer_name))
    healed = (
        hits.unionByName(miss_rows)
        .unionByName(null_raw)
        .withColumn(
            "need_review",
            (F.col("healed_by") != F.lit("cache")) | F.col("healed_text").isNull(),
        )
    )
    # keyed idempotent merge, cache-wins: tag the provenance and take the
    # min-tagged row per key (0 = pre-existing cache, 1 = fresh heal);
    # failed heals (NULL) stay out so the key re-heals next run
    updated_cache = (
        cache.withColumn("__src", F.lit(0))
        .unionByName(
            healed_new.filter(F.col("healed_text").isNotNull())
            .select("cache_key", "healed_text")
            .withColumn("__src", F.lit(1))
        )
        .groupBy("cache_key")
        .agg(F.min(F.struct("__src", "healed_text")).alias("w"))
        .select("cache_key", F.col("w.healed_text").alias("healed_text"))
    )
    return healed, updated_cache
