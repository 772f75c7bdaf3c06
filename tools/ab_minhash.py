"""Same-run A/B of minhash_lsh_dedup variants at sf0.1.

Round-3 regression bisect: r2 measured 0.92s, r3 2.56s idle-host. The only
operator-level delta is two fanout() calls (bbc784f). Times each variant
warm, interleaved, twice, in one session.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from tlmc_etl_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_estimate,
    minhash_signatures,
    word_bigram_hashes,
)
from tlmc_etl_spark.session import get_spark
from tlmc_etl_spark.sources.tables import load_table
from tlmc_etl_spark.tuning import fanout

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def pipeline(docs, fanout_sigs: bool, fanout_bands: bool):
    sh = word_bigram_hashes(docs, "doc_id", "text")
    sigs = minhash_signatures(sh, "doc_id", 64)
    if fanout_sigs:
        sigs = fanout(sigs)
    sigs = sigs.persist()
    if fanout_bands:
        pairs = lsh_candidate_pairs(sigs, "doc_id", 32, 2)
    else:
        # inline copy of lsh_candidate_pairs minus the fanout
        bands = sigs.select(
            F.col("doc_id"),
            F.posexplode(
                F.expr(
                    "transform(sequence(0, 31),"
                    " b -> xxhash64(b, slice(sig, b * 2 + 1, 2)))"
                )
            ).alias("band_idx", "band_key"),
        )
        a = bands.select(F.col("doc_id").alias("id_a"), "band_idx", "band_key")
        b = bands.select(F.col("doc_id").alias("id_b"), "band_idx", "band_key")
        pairs = (
            a.join(b, ["band_idx", "band_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    est = minhash_estimate(sigs, pairs, "doc_id")
    out = est.filter(F.col("est_jaccard") >= 0.1).orderBy("id_a", "id_b")
    return sigs, out


def run(spark, docs, fs, fb):
    sigs, out = pipeline(docs, fs, fb)
    t0 = time.time()
    n = out.count()
    dt = time.time() - t0
    sigs.unpersist()
    return n, dt


def main():
    spark = get_spark("ab-minhash")
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()  # warm
    variants = {
        "current(fs=1,fb=1)": (True, True),
        "no-band-fanout(fs=1,fb=0)": (True, False),
        "no-sig-fanout(fs=0,fb=1)": (False, True),
        "r2-shape(fs=0,fb=0)": (False, False),
    }
    # warm-up pass, then two timed interleaved passes
    for name, (fs, fb) in variants.items():
        run(spark, docs, fs, fb)
    for rep in range(3):
        for name, (fs, fb) in variants.items():
            load = open("/proc/loadavg").read().split()[0]
            n, dt = run(spark, docs, fs, fb)
            print(f"rep{rep} {name:28s} rows={n} {dt:6.2f}s load={load}", flush=True)


if __name__ == "__main__":
    main()
