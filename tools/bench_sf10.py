"""Second-decade scaling point (round-14 VERDICT #3): measure the
headline LLM-pipeline families at sf1 AND sf10 (benchdata/sf10 =
tools/gen_scale.py --copies 100, ~60M lineitem / 500k documents / 32k
embeddings) and record walls + PER-OUTPUT-ROW normalized cost into
SCALING.json under "sf10_families".

Why normalized cost: several families' OUTPUT grows faster than their
input on the derived corpus (near-dup pairs, candidate joins), so a raw
wall ratio conflates true work growth with plan regression. The scaling
statement that must hold for the 100 TB thesis is that the cost PER ROW
OF OUTPUT does not rise with scale — amortization holds across a second
decade. Any family whose normalized cost rises more than the LEDGER_BAR
is recorded in the ledger with its measured numbers (never averaged
away); tests/test_docs_sync.py recomputes the ledger from the stored
walls so the claim cannot drift from the artifact.

Usage: python tools/bench_sf10.py [--out SCALING.json]
Refuses to record on a loaded host (same gate as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from bench import wait_for_idle  # noqa: E402
from tlmc_etl_spark.plans import QUERIES  # noqa: E402
from tlmc_etl_spark.session import get_spark  # noqa: E402

# The ~15 headline LLM-pipeline families the 100 TB thesis leans on.
FAMILIES = [
    "minhash_lsh_dedup",          # MinHash+LSH near-dup pairs
    "simhash_dedup",              # SimHash near-dup
    "minhash_dedup_clusters",     # minhash -> CC clustering
    "doc_dedup_clusters",         # posting-list fold -> CC
    "semantic_dedup_clusters",    # SemDeDup-style cells
    "embedding_near_dup_lsh",     # sign-LSH embedding near-dup
    "two_stage_similarity",       # recall -> chamfer rerank
    "two_stage_weighted_similarity",
    "lsh_ann_topk",               # ANN serving
    "bpe_train_merges",           # BPE training loop
    "bpe_encode_corpus",          # BPE corpus encode
    "doc_quality_classifier",     # distributed LR train+score
    "curation_lifecycle",         # split/mix/quota lifecycle
    "benchmark_contamination",    # n-gram contamination join
    "tfidf_top_terms",            # corpus-trained tf-idf
]

LEDGER_BAR = 1.5  # normalized (per-output-row) cost ratio that demands a ledger entry


def measure(spark, names, sf_dir, reps: int = 2):
    """Best-of-reps wall + output row count per query (same regime as
    bench.run_spark_suite: full re-materialization, caches cleared)."""
    walls, rows = {}, {}
    for name in names:
        best = float("inf")
        n = None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = QUERIES[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        walls[name] = round(best, 3)
        rows[name] = n
    spark.catalog.clearCache()
    return walls, rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "SCALING.json"))
    ap.add_argument("--sf1", default=os.path.join(ROOT, "benchdata", "sf1"))
    ap.add_argument("--sf10", default=os.path.join(ROOT, "benchdata", "sf10"))
    ap.add_argument("--max-wait", type=float, default=600.0)
    args = ap.parse_args()
    for d in (args.sf1, args.sf10):
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            print(f"missing {d} — run tools/gen_scale.py first", file=sys.stderr)
            return 2

    la, overridden, _ = wait_for_idle(args.max_wait)
    if overridden:
        print("host never went idle — refusing to record", file=sys.stderr)
        return 3

    spark = get_spark("tlmc-etl-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in FAMILIES if n in QUERIES]
    # warm JIT/codegen on the small sf before timing either point
    for n in names:
        QUERIES[n].fn(spark, "/root/testdata/sf0.01").count()

    w1, r1 = measure(spark, names, args.sf1)
    print(f"sf1 walls: {w1}", file=sys.stderr)
    w10, r10 = measure(spark, names, args.sf10)
    print(f"sf10 walls: {w10}", file=sys.stderr)

    def norm(w, r):
        # seconds per 1k OUTPUT rows; None when a family's output is
        # empty at that sf (ratio then falls back to raw wall)
        return {
            n: (round(1000.0 * w[n] / r[n], 4) if r[n] else None) for n in names
        }

    n1, n10 = norm(w1, r1), norm(w10, r10)
    wall_ratio = {n: round(w10[n] / w1[n], 2) if w1[n] else None for n in names}
    norm_ratio = {
        n: (round(n10[n] / n1[n], 2) if n1[n] and n10[n] else None)
        for n in names
    }
    ledger = {}
    for n in names:
        eff = norm_ratio[n] if norm_ratio[n] is not None else wall_ratio[n]
        if eff is not None and eff > LEDGER_BAR:
            ledger[n] = (
                f"normalized cost rose {eff}x sf1->sf10 "
                f"(wall {w1[n]}s -> {w10[n]}s, rows {r1[n]} -> {r10[n]}) — "
                "investigate before the next decade"
            )

    art = json.load(open(args.out)) if os.path.exists(args.out) else {}
    art["sf10_families"] = {
        "method": (
            "best-of-2 per query per sf, one warmed local[32] session; "
            "sf10 = tools/gen_scale.py --copies 100 --embed-copies 16 "
            "(copies mutually inert; per-copy workload == sf0.1)"
        ),
        "loadavg_at_start": la,
        "ledger_bar": LEDGER_BAR,
        "sf1": {"dir": args.sf1, "walls": w1, "output_rows": r1,
                "sec_per_1k_output_rows": n1},
        "sf10": {"dir": args.sf10, "walls": w10, "output_rows": r10,
                 "sec_per_1k_output_rows": n10},
        "wall_ratio_10_over_1": wall_ratio,
        "normalized_cost_ratio_10_over_1": norm_ratio,
        "ledger": ledger,
    }
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"wall_ratio": wall_ratio, "norm_ratio": norm_ratio,
                      "ledger": sorted(ledger)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
