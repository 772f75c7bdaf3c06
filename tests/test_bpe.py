"""BPE trainer differential gate: the distributed trainer
(operators/bpe.py — pair counts via explode+agg, merges applied by a
JVM-side aggregate fold) must produce the IDENTICAL merge table to a
from-scratch pure-Python Sennrich (2016) reference implementation on
the same corpus, and the encode path must re-tokenize words exactly as
the reference does. The reference below is written directly from the
paper's algorithm (pair-count dict + best-pair regex merge), not by
inverting the operator's code."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Sennrich et al. 2016, learn_bpe: symbols as tuples, best pair by
    (count, lexicographic) with left-to-right non-overlapping merge."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rnd in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # deterministic: count DESC then lexicographically SMALLEST pair
        best_pair = min(
            (p for p, n in pairs.items() if n == max(pairs.values())),
        )
        best_n = pairs[best_pair]
        if best_n < 2:
            break
        l, r = best_pair
        merges.append((rnd, l, r, l + r, best_n))
        pat = re.compile(
            r"(?<!\S)" + re.escape(l + " " + r) + r"(?!\S)"
        )
        new_vocab = {}
        for syms, c in vocab.items():
            joined = " ".join(syms)
            joined = pat.sub(l + r, joined)
            new_vocab[tuple(joined.split(" "))] = (
                new_vocab.get(tuple(joined.split(" ")), 0) + c
            )
        vocab = new_vocab
    return merges, vocab


class TestBpeTraining:
    def test_merge_table_matches_reference(self, spark, sf_dir):
        import duckdb

        from tlmc_etl_spark.operators.bpe import train_bpe_merges
        from tlmc_etl_spark.sources.tables import load_table

        con = duckdb.connect()
        wc = dict(
            con.execute(
                f"""SELECT w, count(*) FROM (
                      SELECT unnest(string_split(text, ' ')) AS w
                      FROM '{sf_dir}/documents.parquet')
                    WHERE len(w) >= 2 GROUP BY w"""
            ).fetchall()
        )
        ref, _ = _reference_bpe(wc, 8)
        docs = load_table(spark, sf_dir, "documents")
        got = [
            (m["merge_round"], m["left"], m["right"], m["merged"], m["n_weighted"])
            for m in train_bpe_merges(docs, 8)
        ]
        assert got == ref

    def test_fold_is_left_to_right_non_overlapping(self, spark):
        from tlmc_etl_spark.operators.bpe import apply_merge

        df = spark.createDataFrame(
            [(list("aaa"),), (list("aaaa"),), (list("aba"),), ([],)],
            "toks array<string>",
        )
        got = [
            r["m"] for r in df.select(apply_merge(F.col("toks"), "a", "a").alias("m")).collect()
        ]
        assert got == [["aa", "a"], ["aa", "aa"], ["a", "b", "a"], []]

    def test_fully_merged_word_does_not_crash_next_round(self, spark):
        """Regression: once a 2-char word's own pair wins a merge, the
        word collapses to ONE symbol; the next round's pair explode must
        skip it (sequence(1,0) is DESCENDING in Spark — unguarded it
        indexes element_at(toks, 0) and throws under ANSI)."""
        from tlmc_etl_spark.operators.bpe import train_bpe_merges

        docs = spark.createDataFrame(
            [("of of of of of course offer",)], "text string"
        )
        merges = train_bpe_merges(docs, 3)
        assert merges[0]["left"] == "o" and merges[0]["right"] == "f"
        assert len(merges) >= 1  # round 2 ran without crashing

    def test_encode_path_matches_reference_tokenization(self, spark, sf_dir):
        import duckdb

        from tlmc_etl_spark.operators.bpe import (
            encode_with_merges,
            train_bpe_merges,
        )
        from tlmc_etl_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        merges = train_bpe_merges(docs, 8)
        con = duckdb.connect()
        wc = dict(
            con.execute(
                f"""SELECT w, count(*) FROM (
                      SELECT unnest(string_split(text, ' ')) AS w
                      FROM '{sf_dir}/documents.parquet')
                    WHERE len(w) >= 2 GROUP BY w"""
            ).fetchall()
        )
        _, ref_vocab = _reference_bpe(wc, 8)
        words = sorted(wc)[:200]
        df = spark.createDataFrame([(w,) for w in words], "w string").select(
            "w", F.split("w", "").alias("toks")
        )
        enc = {
            r["w"]: tuple(r["e"])
            for r in df.select(
                "w", encode_with_merges(F.col("toks"), merges).alias("e")
            ).collect()
        }
        ref_enc = {}
        for syms in ref_vocab:
            ref_enc["".join(syms)] = syms
        for w in words:
            assert enc[w] == ref_enc[w], w


class TestBpeCorpusEncode:
    def test_corpus_encode_matches_python_replay(self, spark, sf_dir):
        """bpe_encode_corpus sequential-replay gate: train the reference
        BPE from scratch, greedily re-encode every document in Python,
        and the per-doc (n_words, n_symbols, n_tokens) integers must be
        IDENTICAL — proving the vocabulary-encode + broadcast-multiplicity
        aggregation loses nothing vs tokenizing each document directly."""
        import duckdb

        from tlmc_etl_spark.plans import QUERIES

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
        wc: Counter = Counter()
        for _, text in rows:
            for w in text.split(" "):
                if len(w) >= 2:
                    wc[w] += 1
        _, ref_vocab = _reference_bpe(dict(wc), 8)
        enc_len = {"".join(syms): len(syms) for syms in ref_vocab}
        expect = {}
        for doc_id, text in rows:
            words = [w for w in text.split(" ") if w]
            n_sym = sum(len(w) for w in words)
            n_tok = sum(enc_len.get(w, 1) for w in words)
            expect[doc_id] = (len(words), n_sym, n_tok)
        got = QUERIES["bpe_encode_corpus"].fn(spark, sf_dir).collect()
        assert len(got) == len(expect)
        for r in got:
            e = expect[r["doc_id"]]
            assert (r["n_words"], r["n_symbols"], r["n_tokens"]) == e, (
                r["doc_id"], (r["n_words"], r["n_symbols"], r["n_tokens"]), e
            )
            # Spark F.round is HALF_UP; Python round is banker's — compare
            # through decimal with the HALF_UP rule Spark pins
            from decimal import ROUND_HALF_UP, Decimal

            want = float(
                Decimal(e[1] / e[2]).quantize(Decimal("0.0001"), ROUND_HALF_UP)
            )
            assert r["compression"] == want
