"""Registry-count drift gate: README/COVERAGE/PERFORMANCE quote the
query-registry sizes; those quotes must be DERIVED from
`tlmc_etl_spark.plans.QUERIES` at HEAD, never remembered. This test
turns the social rule into CI: any doc line quoting "N queries" for the
registry or "N oracle-backed" must match the live counts, and the bench
HEADLINE list must match the "M queries" the bench rows quote.

No Spark session needed — pure registry + file greps, so it runs in
milliseconds and can't be skipped for cost.
"""

from __future__ import annotations

import os
import re

from tlmc_etl_spark.plans import QUERIES

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _read(name: str) -> str:
    return open(os.path.join(ROOT, name)).read()


def test_registry_counts_match_docs():
    n_queries = len(QUERIES)
    n_oracle = sum(1 for q in QUERIES.values() if q.oracle is not None)

    for doc in ("README.md", "COVERAGE.md", "PERFORMANCE.md"):
        text = _read(doc)
        for m in re.finditer(r"(\d+)\s+oracle-backed", text):
            assert int(m.group(1)) == n_oracle, (
                f"{doc} quotes {m.group(1)} oracle-backed; registry has "
                f"{n_oracle} — re-derive the doc counts from QUERIES"
            )
        for m in re.finditer(r"registry holds \*\*(\d+) queries", text):
            assert int(m.group(1)) == n_queries, (
                f"{doc} quotes {m.group(1)} registry queries; registry has "
                f"{n_queries}"
            )
        for m in re.finditer(r"the (\d+) `ext` queries", text):
            assert int(m.group(1)) == n_queries - n_oracle, (
                f"{doc} quotes {m.group(1)} ext queries; registry has "
                f"{n_queries - n_oracle}"
            )


def test_headline_count_matches_perf_doc():
    from bench import HEADLINE

    n_headline = len([n for n in HEADLINE if n in QUERIES])
    text = _read("PERFORMANCE.md")
    # only the current round's row (the first "bench.py, N queries" hit)
    # must match — historical rows keep their historical counts
    m = re.search(r"bench\.py, (\d+) queries", text)
    assert m is not None, "PERFORMANCE.md lost its headline-suite row"
    assert int(m.group(1)) == n_headline, (
        f"PERFORMANCE.md quotes a {m.group(1)}-query headline suite; "
        f"bench.py HEADLINE has {n_headline}"
    )


def test_every_headline_query_is_registered():
    from bench import HEADLINE

    missing = [n for n in HEADLINE if n not in QUERIES]
    assert not missing, f"bench HEADLINE names unregistered queries: {missing}"


def test_scaling_claims_derive_from_artifact():
    """Round-6 VERDICT #4: PERFORMANCE.md's 'N of M <= 2.5x' count and
    its >10x outlier list must be RECOMPUTED from SCALING.json, not
    remembered — round 5 shipped '30 of 38 ... nothing superlinear
    except one query' while the committed artifact measured 29/38 and
    two >10x queries."""
    import json

    art = json.load(open(os.path.join(ROOT, "SCALING.json")))
    ratios = art["per_query_scale_ratio"]["1/0.1"]
    n_le = sum(1 for v in ratios.values() if v is not None and v <= 2.5)
    n_total = len(ratios)
    over_10x = sorted(n for n, v in ratios.items() if v is not None and v > 10)

    text = _read("PERFORMANCE.md")
    m = re.search(r"(\d+) of (\d+) queries (?:≤|<=) 2\.5", text)
    assert m is not None, (
        "PERFORMANCE.md lost its 'N of M queries ≤ 2.5×' scaling claim"
    )
    assert (int(m.group(1)), int(m.group(2))) == (n_le, n_total), (
        f"PERFORMANCE.md claims {m.group(1)}/{m.group(2)} ≤ 2.5×; "
        f"SCALING.json measures {n_le}/{n_total}"
    )
    for name in over_10x:
        assert name in text, (
            f"SCALING.json measures {name} at {ratios[name]}× (>10×) but "
            "PERFORMANCE.md does not name it — superlinear queries must "
            "be documented, not averaged away"
        )


def test_sf10_ledger_derives_from_artifact():
    """Round-14 VERDICT #3: the second-decade scaling point. The ledger
    of families whose per-output-row cost rose sf1->sf10 must be
    RECOMPUTED from the stored walls/rows, and PERFORMANCE.md must name
    every ledgered family — never average one away."""
    import json

    art = json.load(open(os.path.join(ROOT, "SCALING.json")))
    sec = art.get("sf10_families")
    assert sec is not None, "SCALING.json lost its sf10_families section"
    bar = sec["ledger_bar"]
    names = list(sec["sf1"]["walls"])

    recomputed = {}
    for n in names:
        w1, w10 = sec["sf1"]["walls"][n], sec["sf10"]["walls"][n]
        r1, r10 = sec["sf1"]["output_rows"][n], sec["sf10"]["output_rows"][n]
        if r1 and r10:
            eff = round((1000.0 * w10 / r10) / (1000.0 * w1 / r1), 2)
        elif w1:
            eff = round(w10 / w1, 2)
        else:
            eff = None
        if eff is not None and eff > bar:
            recomputed[n] = eff
    assert sorted(recomputed) == sorted(sec["ledger"]), (
        f"stored ledger {sorted(sec['ledger'])} != recomputed "
        f"{sorted(recomputed)} from the stored walls/rows"
    )
    text = _read("PERFORMANCE.md")
    for n in recomputed:
        assert n in text, (
            f"sf10 ledger names {n} ({recomputed[n]}x) but PERFORMANCE.md "
            "does not discuss it"
        )
