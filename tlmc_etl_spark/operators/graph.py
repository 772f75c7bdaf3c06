"""Connected components over a pair graph — the clustering step a
large-scale dedup pipeline runs AFTER near-dup pair generation (MinHash/
SimHash/exact-Jaccard pairs → clusters → keep one representative per
cluster).

Spark shape: iterative min-label propagation (the Pregel/small-star idea
reduced to DataFrame ops). Each round a node adopts the smallest label among
itself and its neighbors; convergence in diameter(G) rounds; the final label
IS the smallest node id in the component, which makes results deterministic
and oracle-checkable (a recursive CTE computes the same closure in SQL).

Reference analogue: the artist deduplicator collapses alias groups onto one
preferred id (artist_deduplicator.py:30-73) — same collapse, generalized to
arbitrary similarity graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str,
    src_col: str,
    dst_col: str,
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every node; component = min node id reachable.

    Each iteration is one join + one map-side-combinable min aggregation
    over the (symmetrized) edge list — at 100 TB scale that is the standard
    label-propagation round, and `localCheckpoint` cuts the growing lineage
    so the plan stays bounded (on a cluster, a checkpoint dir or persisted
    intermediate table plays this role). Iterations are bounded by the
    component diameter, not the corpus size; near-dup graphs are
    shallow-diameter in practice.
    """
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct().persist()
    # Only edge-endpoint nodes can ever change labels — iterate on that
    # (typically tiny) active subgraph and union the untouched singletons
    # back at the end, so per-round cost follows |edges|, not |corpus|.
    # The endpoint set is checkpointed because it outlives sym's cache: the
    # returned DataFrame is lazy, and a post-unpersist consumer of sym
    # would silently recompute the whole upstream pair pipeline.
    endpoints = sym.select("a").distinct().localCheckpoint(eager=True)
    all_ids = nodes.select(F.col(id_col).alias("a"))
    active = all_ids.join(endpoints, "a", "left_semi")
    labels = active.select("a", F.col("a").alias("label")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = sym.join(labels, "a").select(F.col("b").alias("a"), "label")
        new = (
            labels.union(nbr).groupBy("a").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "a")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    singletons = all_ids.join(endpoints, "a", "left_anti").select(
        "a", F.col("a").alias("label")
    )
    sym.unpersist()
    return labels.unionByName(singletons).select(
        F.col("a").alias(id_col), F.col("label").alias("component")
    )
