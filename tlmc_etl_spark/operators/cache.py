"""Memoized-fetch cache as bronze-table operators.

The reference funnels every external-info stage through a keyed source
cache (Cache.py:24-110, AdvancedCache.py:17-35): a normalized cache id
is looked up in an index table; an index row whose file still exists is
a HIT (no fetch); a missing index row whose file nevertheless exists in
the cache directory is RESTORED — re-registered without refetching,
which is what makes a cache directory carried over from another machine
usable after its index db died; everything else is a MISS that fetches
and then upserts both file and index row.

The Spark shape: the index and the payload-store listing are DataFrames,
resolution is two left joins + a CASE (one shuffle each, broadcastable
when the index is small), and the post-run index is an idempotent
keyed merge — running resolve+commit twice is the identity on the index
and turns every request into a hit, the property the decorator's
row-exists/replace/create dance guarantees imperatively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The reference's NormalizePath character class (Cache.py:11-12): every
# filesystem-hostile char becomes the substitution char.
_HOSTILE = r'[<>:"/\\|?*]'


def normalize_cache_path(col: Column | str, subchar: str = "_") -> Column:
    """Filesystem-safe cache path component (Cache.py:11-12)."""
    return F.regexp_replace(col, _HOSTILE, subchar)


def cache_key_from_url(cache_id: Column | str, url: Column | str) -> Column:
    """`<cache_id>__<normalized unquoted url-path>` (Cache.py:19-20, 31).

    URL parsing and percent-decoding stay JVM-side (parse_url/url_decode);
    the key is deterministic, so distributed workers compute identical
    keys with no coordination — the property that lets fetch-dedup be a
    plain groupBy/join instead of a locked index.
    """
    cid = F.lit(cache_id) if isinstance(cache_id, str) else cache_id
    path = F.url_decode(F.parse_url(url, F.lit("PATH")))
    return F.concat(cid, F.lit("__"), normalize_cache_path(path))


def cache_resolve(
    requests: DataFrame,
    index: DataFrame,
    store: DataFrame,
    key: str = "cache_key",
) -> DataFrame:
    """Classify each requested key: hit / restored / miss.

    `index` carries (key, file_ok) — file_ok is whether the indexed file
    still exists (the reference re-checks os.path.exists on every hit;
    an index row pointing at a vanished file is NOT a hit). `store` is
    the payload-directory listing (one key column). Requests are
    deduplicated by key first — N concurrent requests for one URL must
    cost at most one fetch (fetch-dedup).

    Output: (key, status) with status in {'hit','restored','miss'}.
    """
    req = requests.select(key).distinct()
    idx = index.select(key, "file_ok")
    st = store.select(key).withColumn("_in_store", F.lit(True))
    joined = req.join(idx, key, "left").join(st, key, "left")
    status = (
        F.when(F.coalesce("file_ok", F.lit(False)), "hit")
        .when(F.coalesce("_in_store", F.lit(False)), "restored")
        .otherwise("miss")
    )
    return joined.select(key, status.alias("status"))


def cache_commit(index: DataFrame, resolved: DataFrame, key: str = "cache_key") -> DataFrame:
    """Post-run index: restored and fetched keys become valid rows.

    Idempotent keyed merge (the replace-or-create upsert of
    Cache.py:57-70,85-107 as one aggregation): max(file_ok) per key, so
    re-registering an existing key never duplicates it and a dead row is
    revived by this run's fetch. committing the same resolution twice is
    the identity.
    """
    updates = (
        resolved.filter(F.col("status") != "hit")
        .select(key)
        .withColumn("file_ok", F.lit(True))
    )
    return (
        index.select(key, "file_ok")
        .unionByName(updates)
        .groupBy(key)
        .agg(F.max("file_ok").alias("file_ok"))
    )
