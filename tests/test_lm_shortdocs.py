"""Regression gate for the bigram-LM vocabulary definition on corpora
containing 0/1-token documents.

The smoothing denominator is (c_ctx + V) with V the distinct-token count
over the WHOLE corpus — including tokens that only appear in documents
too short to produce a bigram. Computing V after the size(ws) >= 2
filter silently shifts every avg_logp on any corpus with short docs
(latent on the standard fixtures, whose documents all carry >= 10
tokens). This test runs the Spark plan and the registered DuckDB oracle
on a purpose-built corpus with an empty doc, a 1-token doc, and a token
("singleton") that appears ONLY in the 1-token doc, so a filtered V
would be visibly wrong.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tlmc_etl_spark.plans import QUERIES


@pytest.fixture(scope="module")
def short_corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lm_shortdocs")
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "the cat sat on the mat",
                "singleton",
                "",
                "the dog sat",
                "cat on mat the cat",
            ],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
        }
    )
    docs["n_chars"] = docs.text.str.len()
    pq.write_table(pa.Table.from_pandas(docs), str(tmp / "documents.parquet"))
    return str(tmp)


def _oracle(short_corpus: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{short_corpus}/documents.parquet'"
    )
    return con.execute(sql).fetchdf()


def test_bigram_lm_vocab_counts_short_docs(spark, short_corpus):
    q = QUERIES["bigram_lm_doc_score"]
    got = q.fn(spark, short_corpus).toPandas()
    want = _oracle(short_corpus, q.oracle)
    # docs 2 (1 token) and 3 (empty) produce no bigram rows; V still
    # includes "singleton" and the empty-split token, so any filtered-V
    # regression shifts avg_logp for every surviving doc.
    assert list(got.doc_id) == [1, 4, 5] == list(want.doc_id)
    assert list(got.n_bigrams) == list(want.n_bigrams)
    assert (abs(got.avg_logp - want.avg_logp) < 1e-9).all()


def test_tfidf_handles_short_docs(spark, short_corpus):
    q = QUERIES["tfidf_top_terms"]
    got = q.fn(spark, short_corpus).toPandas()
    want = _oracle(short_corpus, q.oracle)
    assert len(got) == len(want)
    g = got.sort_values(["doc_id", "rnk"]).reset_index(drop=True)
    w = want.sort_values(["doc_id", "rnk"]).reset_index(drop=True)
    assert (g.term == w.term).all()
    assert (abs(g.tfidf - w.tfidf) < 1e-9).all()
