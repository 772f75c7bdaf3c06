"""Duration-multiset mirror detection and greedy LCP pairing.

Two per-group operators from the reference whose semantics are inherently
sequential-greedy (so they live in `applyInPandas`, parallel across
groups):

 - mirror dedup: two directories are mirrors if their duration multisets
   match greedily within ±tolerance on ≥85% of tracks; the later
   (sort-ordered) one is dropped — dedupes re-encodes/instrumental rips
   (disc_duration_guard.py:50-57,92-112,137-148).
 - LCP pairing: cue files pair to audio files by maximal common prefix,
   greedy, each file used once (Shared/utils.py:159-189).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tlmc_etl_spark.tuning import fanout


def durations_mirror(a: list[float], b: list[float], tol: float = 8.0, frac: float = 0.85) -> bool:
    """Greedy multiset match: each duration in the smaller set consumes the
    closest unused duration in the larger within ±tol; mirror iff the
    matched fraction (of the larger side) ≥ frac."""
    small, large = (a, b) if len(a) <= len(b) else (b, a)
    if not large:
        return False
    remaining = sorted(large)
    matched = 0
    for d in sorted(small):
        best_i, best_gap = -1, tol
        for i, r in enumerate(remaining):
            gap = abs(r - d)
            if gap <= best_gap:
                best_i, best_gap = i, gap
            if r - d > tol:
                break
        if best_i >= 0:
            remaining.pop(best_i)
            matched += 1
    return matched / len(large) >= frac


def mirror_dedup(
    tracks: DataFrame,
    group_col: str,
    dir_col: str,
    duration_col: str,
    tol: float = 8.0,
    frac: float = 0.85,
) -> DataFrame:
    """Within each group, mark directories whose duration multiset mirrors
    an earlier (sort-ordered) directory.

    Output: (group, dir, n_tracks, is_mirror, mirror_of). Ordering favors
    the first-sorted spelling — the reference's 'Disc 1' beats
    'Disc 1 (mp3)' rule. Groups process independently in applyInPandas;
    within a group the scan is O(dirs² · tracks) which the corpus bounds
    (dirs per album ≲ 20).
    """
    slim = tracks.select(
        F.col(group_col).alias("grp"), F.col(dir_col).alias("dirname"), F.col(duration_col).alias("dur")
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        grp = pdf["grp"].iloc[0]
        dirs = sorted(pdf["dirname"].unique())
        durs = {d: sorted(pdf[pdf["dirname"] == d]["dur"].tolist()) for d in dirs}
        out = []
        kept: list[str] = []
        for d in dirs:
            src = None
            for k in kept:
                if durations_mirror(durs[d], durs[k], tol, frac):
                    src = k
                    break
            if src is None:
                kept.append(d)
            out.append((grp, d, len(durs[d]), src is not None, src))
        return pd.DataFrame(out, columns=["grp", "dirname", "n_tracks", "is_mirror", "mirror_of"])

    # O(dirs²·tracks) Python per group over a tiny shuffle — AQE-exempt
    # fan-out on the group key so the stage keeps every core.
    return fanout(slim, "grp").groupBy("grp").applyInPandas(
        solve, schema="grp long, dirname string, n_tracks long, is_mirror boolean, mirror_of string"
    )


def lcp(a: str, b: str) -> int:
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return n


def lcp_pairing(
    left: DataFrame, right: DataFrame, group_col: str, left_col: str, right_col: str
) -> DataFrame:
    """Greedy longest-common-prefix 1:1 pairing per group.

    All (left, right) prefix lengths are computed, then pairs are taken
    longest-first, each side used once — the reference's cue↔audio pairing
    (Shared/utils.py:159-189). Ties break lexicographically for
    determinism (SURVEY.md §7.4-1).
    """
    l_slim = left.select(F.col(group_col).alias("grp"), F.col(left_col).alias("lname")).withColumn(
        "side", F.lit("L")
    )
    r_slim = right.select(F.col(group_col).alias("grp"), F.col(right_col).alias("lname")).withColumn(
        "side", F.lit("R")
    )
    both = l_slim.unionByName(r_slim)

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        grp = pdf["grp"].iloc[0]
        ls = sorted(pdf[pdf["side"] == "L"]["lname"].tolist())
        rs = sorted(pdf[pdf["side"] == "R"]["lname"].tolist())
        cands = sorted(
            ((lcp(a, b), a, b) for a in ls for b in rs), key=lambda t: (-t[0], t[1], t[2])
        )
        used_l: set[str] = set()
        used_r: set[str] = set()
        out = []
        for score, a, b in cands:
            if score == 0 or a in used_l or b in used_r:
                continue
            used_l.add(a)
            used_r.add(b)
            out.append((grp, a, b, score))
        return pd.DataFrame(out, columns=["grp", "left_name", "right_name", "prefix_len"])

    # O(|L|·|R|) prefix scans per group in Python — same fan-out rationale
    # as mirror_dedup.
    return fanout(both, "grp").groupBy("grp").applyInPandas(
        solve, schema="grp long, left_name string, right_name string, prefix_len int"
    )
