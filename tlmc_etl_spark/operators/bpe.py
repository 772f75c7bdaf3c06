"""BPE tokenizer training as an iterative Spark job.

The reference corpus feeds tokenizer work downstream of curation; the
repo already measures the inner loop (plans/text.py:bpe_pair_counts).
This module runs the WHOLE training loop (Sennrich et al. 2016, public):
k rounds of [distributed pair count -> argmax -> apply merge], with the
classic scale trick — train on the (distinct word, count) table, which
collapses 10^11 corpus tokens to 10^7 distinct words, so each round's
cost is bounded by vocabulary, not corpus size.

Spark-first shape per round:
 - pair counts: row-local explode over the symbol arrays + one hash agg
   (map-side partial combine does the heavy lifting);
 - the merge CHOICE is a 1-row TakeOrdered collect (count DESC, then
   lexicographic pair — deterministic across engines and runs);
 - the merge APPLY is a JVM-side F.aggregate fold over each symbol
   array (left-to-right non-overlapping, exactly re.sub's semantics in
   the reference implementation) — no Python touches the data path;
 - localCheckpoint(eager=False) truncates lineage each round (k chained
   rounds otherwise stack k analysis passes onto every later job); the
   LAZY form rides the next round's argmax job instead of paying a
   separate materialization job per round (the CC-loop pattern from
   PERFORMANCE.md §11) — 1 job per round, not 2;
 - words already collapsed to one symbol are DROPPED from the loop
   table at merge-apply time: a 1-symbol word can never contribute a
   pair again, so carrying it through later rounds' checkpoints and
   scans is pure waste (and the pair-count filter made it invisible to
   results already).

Greedy-fold correctness note: folding "last == left and current ==
right -> replace last with left+right" IS left-to-right non-overlapping
application, including the self-pair case — on "aaa" with merge (a,a)
the first merge turns the accumulator tail into "aa", which no longer
equals "a", so the third "a" appends: ["aa","a"], matching the
reference regex semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def words_with_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) base table: the corpus fold every BPE round reuses."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    # words already collapsed to ONE symbol contribute no pairs — and
    # sequence(1, 0) is DESCENDING in Spark, so without this filter the
    # explode would index element_at(toks, 0) and throw under ANSI (the
    # conventions-memory sequence pitfall; a frequent 2-char word like
    # 'of' hits it on the round after its own pair wins)
    pairs = symbols.filter(F.size("toks") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(element_at(toks, i) AS l, "
                "element_at(toks, i + 1) AS r))"
            )
        ).alias("p"),
        "wc",
    )
    return pairs.groupBy("p.l", "p.r").agg(F.sum("wc").alias("n_weighted"))


def apply_merge(toks_col, left: str, right: str):
    """JVM-side left-to-right non-overlapping merge of (left, right) ->
    left+right over a symbol array column."""
    merged = left + right
    return F.aggregate(
        toks_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe_merges(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[dict]:
    """Learn `n_merges` BPE merges from the corpus. Returns the merge
    table [{merge_round, left, right, merged, n_weighted}] in learned
    order — the artifact a tokenizer ships. Ties break lexicographically
    (count DESC, left ASC, right ASC) so training is deterministic.

    Stops early if no pair occurs twice (degenerate corpus)."""
    symbols = words_with_counts(docs, text_col).select(
        F.split("w", "").alias("toks"), "wc"
    )
    symbols = symbols.localCheckpoint(eager=False)
    out: list[dict] = []
    for rnd in range(n_merges):
        best = (
            _pair_counts(symbols)
            .orderBy(F.col("n_weighted").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n_weighted"] < 2:
            break
        left, right, n = best[0]["l"], best[0]["r"], int(best[0]["n_weighted"])
        out.append(
            {
                "merge_round": rnd,
                "left": left,
                "right": right,
                "merged": left + right,
                "n_weighted": n,
            }
        )
        symbols = (
            symbols.select(
                apply_merge(F.col("toks"), left, right).alias("toks"), "wc"
            )
            # a fully-collapsed word can never pair again — drop it so
            # later rounds checkpoint and scan a shrinking table
            .filter(F.size("toks") >= 2)
            .localCheckpoint(eager=False)
        )
    return out


def encode_with_merges(toks_col, merges: list[dict]):
    """Apply a learned merge table in order to a symbol array column —
    the tokenizer's ENCODE path, same fold as training."""
    col = toks_col
    for m in merges:
        col = apply_merge(col, m["left"], m["right"])
    return col
