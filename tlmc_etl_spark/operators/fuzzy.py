"""Fuzzy 1:1 assignment join (Hungarian) over grouped candidate pairs.

Reference: local tracks × thwiki tracks per album — cost = fuzz.ratio on
normalized titles, globally-optimal 1:1 via linear_sum_assignment, album
accepted only if Σscore ≥ 0.8 × potential (song_info_matcher.py:123-208).

Spark shape: candidate pairing is an equi-join on the group key (album);
the per-group optimal assignment runs in `applyInPandas`, which is exactly
the right boundary — the global problem is embarrassingly parallel across
groups, and each group's matrix is small (tracks per album ≲ 100).
"""

from __future__ import annotations

import unicodedata
from difflib import SequenceMatcher

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tlmc_etl_spark.operators.assignment import linear_sum_assignment


def match_key(s: str) -> str:
    """Unicode-normalized match key: NFKC, lowercase, letters+digits only.

    Reference has two recipes (NFKD vs NFKC+NFD, song_page_scraper.py:93-98,
    song_info_matcher.py:100-107); SURVEY.md §7.4-2 says pick ONE and pin
    it — this engine pins NFKC.
    """
    s = unicodedata.normalize("NFKC", s).lower()
    return "".join(ch for ch in s if ch.isalnum())


def similarity(a: str, b: str) -> float:
    """Title similarity in [0,100], difflib ratio on match keys (the
    stdlib stand-in for fuzz.ratio; same scale, pinned here)."""
    return 100.0 * SequenceMatcher(None, match_key(a), match_key(b)).ratio()


def hungarian_match_join(
    left: DataFrame,
    right: DataFrame,
    group_col: str,
    left_id: str,
    left_title: str,
    right_id: str,
    right_title: str,
    accept_fraction: float = 0.8,
) -> DataFrame:
    """Per-group globally-optimal 1:1 fuzzy match.

    Output: one row per matched pair with the group acceptance flag
    (group kept only if total score ≥ accept_fraction × 100 × n_pairs,
    the reference's threshold, song_info_matcher.py:147-163).
    """
    l_tag = left.select(
        F.col(group_col).alias("grp"),
        F.col(left_id).alias("left_id"),
        F.col(left_title).alias("left_title"),
    )
    r_tag = right.select(
        F.col(group_col).alias("grp"),
        F.col(right_id).alias("right_id"),
        F.col(right_title).alias("right_title"),
    )
    lg = l_tag.withColumn("side", F.lit("L")).withColumnRenamed("left_id", "id").withColumnRenamed(
        "left_title", "title"
    )
    rg = r_tag.withColumn("side", F.lit("R")).withColumnRenamed("right_id", "id").withColumnRenamed(
        "right_title", "title"
    )
    both = lg.unionByName(rg)

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        grp = pdf["grp"].iloc[0]
        L = pdf[pdf["side"] == "L"].sort_values("id").reset_index(drop=True)
        R = pdf[pdf["side"] == "R"].sort_values("id").reset_index(drop=True)
        if len(L) == 0 or len(R) == 0:
            return pd.DataFrame(
                columns=["grp", "left_id", "right_id", "score", "group_total", "accepted"]
            )
        S = np.array(
            [[similarity(lt, rt) for rt in R["title"]] for lt in L["title"]], dtype=np.float64
        )
        rows, cols = linear_sum_assignment(-S)  # maximize similarity
        scores = S[rows, cols]
        n = min(len(L), len(R))
        total = float(scores.sum())
        accepted = total >= accept_fraction * 100.0 * n
        return pd.DataFrame(
            {
                "grp": grp,
                "left_id": L["id"].to_numpy()[rows],
                "right_id": R["id"].to_numpy()[cols],
                "score": np.round(scores, 4),
                "group_total": round(total, 4),
                "accepted": accepted,
            }
        )

    out_schema = (
        "grp long, left_id string, right_id string, score double, group_total double, accepted boolean"
    )
    return both.groupBy("grp").applyInPandas(solve, schema=out_schema)
