"""SQL-literal oracles for the production `_kmeans` ANN variants.

The five k-means-quantizer queries (ivf_ann_topk_kmeans,
ivf_pq_topk_kmeans, pq_adc_topk_kmeans, pq_recon_kmeans,
opq_pq_recon_kmeans) train seeded driver-side numpy k-means — training is
deterministic but not SQL-expressible, so these rows used to record
`no_oracle` in the driver's correctness artifact while their portable-hash
twins (ivf_ann_topk, pq_adc_topk, …) carried the value check.

This module closes that gap with the generated-literal pattern
embedding_near_dup_lsh_hi already uses (plans/curation2.py): the CONVERGED
quantizers — coarse centroids, PQ codebooks, the OPQ rotation — are
generated once at the driver's oracle scale factor (sf0.01,
tools/gen_kmeans_literals.py), committed in fixtures/kmeans_sf0_01.json,
and embedded here as SQL VALUES literals. DuckDB then replays the full
SERVING path — cell assignment, PQ encoding, ADC table scoring, ranking —
end-to-end against the same corpus, so the driver value-checks the exact
computation the production queries run. Training itself is pinned by
tests/test_kmeans_oracles.py: recomputing the artifacts at sf0.01 must
reproduce the committed literals bit-for-bit (numpy seeded k-means on a
deterministic take-ordered sample is bit-stable; repr(float) JSON
round-trips IEEE doubles losslessly).

Because the literals are converged ON sf0.01 data, these oracles are
value-valid only there — `oracle_sf_dir` marks them, and every parity
harness (tests/test_oracle_parity.py, tools/check_oracle.py) runs both
engines at the pinned directory. At any other sf the queries retrain
themselves and the recall/consistency gates in tests/test_pq.py are the
correctness statement (same split the LSH-hi twin documents).

Serving semantics replayed (all raw-float, matching round_assign=False):
 - cell assignment ranks RAW cosine (no 6dp pre-round) with index
   tie-break; ties are measure-zero for real-valued corpora;
 - PQ encode: argmin over |c|^2 - 2 x.c per subspace, index tie-break;
 - final scores round(., 6) with neighbor-asc tie-break — identical to
   _grouped_cosine_topk / _adc_serve / _ivf_pq_serve.

Reference parity: faiss_index_builder.py:10-23 (OPQ64,IVF16384,PQ64x8).
"""

from __future__ import annotations

import json
import os

from tlmc_etl_spark.plans.registry import QUERIES

ORACLE_SF_DIR = "/root/testdata/sf0.01"

_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "kmeans_sf0_01.json",
)


def _vec(xs) -> str:
    return "[" + ", ".join(repr(float(x)) for x in xs) + "]"


def _centroid_values(C) -> str:
    """VALUES rows (ci, c) for a list of centroid vectors."""
    return ",\n    ".join(f"({i}, {_vec(c)})" for i, c in enumerate(C))


def _codebook_values(cb) -> str:
    """VALUES rows (s, ci, c) for an (m, k, ds) codebook tensor."""
    rows = []
    for s, sub in enumerate(cb):
        for ci, c in enumerate(sub):
            rows.append(f"({s}, {ci}, {_vec(c)})")
    return ",\n    ".join(rows)


def _rotation_values(R) -> str:
    """VALUES rows (j, r) — row j of the rotation; rotated[j] = dot(v, r)."""
    return ",\n    ".join(f"({j}, {_vec(row)})" for j, row in enumerate(R))


# Shared CTE prologue: corpus as doubles + unit-normalized form. The
# embeddings column is float32 on disk; both engines cast to double before
# any arithmetic, so the inputs agree bitwise.
_CORPUS = """
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), vn AS (
  SELECT vec_id, v,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
  FROM e
)"""


def _encode_cte(corpus: str, cb_values: str, m: int, ds: int) -> str:
    """codes(vec_id, s, ci): nearest codeword per subspace, raw d2,
    index tie-break — pq_encode's argmin."""
    return f"""cw(s, ci, c) AS (
  VALUES
    {cb_values}
), {corpus}, asg AS (
  SELECT vn.vec_id, cw.s, cw.ci,
         list_dot_product(cw.c, cw.c) -
           2 * list_dot_product(
                 vn.u[cw.s * {ds} + 1 : (cw.s + 1) * {ds}], cw.c) AS d2
  FROM vn CROSS JOIN cw
), codes AS (
  SELECT vec_id, s, ci FROM (
    SELECT vec_id, s, ci,
           row_number() OVER (PARTITION BY vec_id, s
                              ORDER BY d2 ASC, ci ASC) AS rk
    FROM asg
  ) WHERE rk = 1
)"""


def ivf_ann_oracle(coarse) -> str:
    """ivf_ann_topk_kmeans: literal-centroid cell assignment (raw cosine),
    4-cell probe, exact cosine top-10 (round 6, neighbor tie-break)."""
    return f"""
WITH cent(ci, c) AS (
  VALUES
    {_centroid_values(coarse)}
), {_CORPUS}, sims AS (
  SELECT vn.vec_id, cent.ci, list_dot_product(vn.u, cent.c) AS s
  FROM vn CROSS JOIN cent
), cells AS (
  SELECT vec_id, ci,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY s DESC, ci ASC) AS rk
  FROM sims
), pairs AS (
  SELECT p.vec_id AS anchor, a.vec_id AS neighbor,
         round(list_dot_product(ea.v, eb.v) /
               (sqrt(list_dot_product(ea.v, ea.v)) *
                sqrt(list_dot_product(eb.v, eb.v))), 6) AS score
  FROM (SELECT vec_id, ci FROM cells WHERE rk <= 4) p
  JOIN (SELECT vec_id, ci FROM cells WHERE rk = 1) a USING (ci)
  JOIN e ea ON ea.vec_id = p.vec_id
  JOIN e eb ON eb.vec_id = a.vec_id
  WHERE p.vec_id != a.vec_id
), ranked AS (
  SELECT anchor, neighbor, score,
         row_number() OVER (PARTITION BY anchor
                            ORDER BY score DESC, neighbor ASC) AS rank
  FROM pairs
)
SELECT anchor, neighbor, score, rank FROM ranked
WHERE rank <= 10 ORDER BY anchor, rank
"""


def pq_recon_oracle(cb, rotation=None) -> str:
    """pq_recon_kmeans / opq_pq_recon_kmeans: encode with literal
    codebooks, then recon_cosine = dot(u, decode) / |decode| (u is unit,
    decode per subspace is the chosen codeword), round 6. With `rotation`
    the corpus is first rotated by the literal orthogonal matrix
    (rotated[j] = dot(v, R_row_j)), matching rotate_vectors."""
    m, ds = len(cb), len(cb[0][0])
    if rotation is None:
        corpus = _CORPUS.strip()
    else:
        corpus = f"""rot(j, r) AS (
  VALUES
    {_rotation_values(rotation)}
), raw AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0
  FROM embeddings
), e AS (
  SELECT vec_id, list(val ORDER BY j) AS v FROM (
    SELECT raw.vec_id, rot.j, list_dot_product(raw.v0, rot.r) AS val
    FROM raw CROSS JOIN rot
  ) GROUP BY vec_id
), vn AS (
  SELECT vec_id, v,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
  FROM e
)"""
    return f"""
WITH {_encode_cte(corpus, _codebook_values(cb), m, ds)}, parts AS (
  SELECT codes.vec_id,
         list_dot_product(
           vn.u[codes.s * {ds} + 1 : (codes.s + 1) * {ds}], cw.c) AS p,
         list_dot_product(cw.c, cw.c) AS csq
  FROM codes
  JOIN cw ON cw.s = codes.s AND cw.ci = codes.ci
  JOIN vn ON vn.vec_id = codes.vec_id
)
SELECT vec_id, round(sum(p) / sqrt(sum(csq)), 6) AS recon_cosine
FROM parts GROUP BY vec_id ORDER BY vec_id
"""


def pq_adc_oracle(cb, n_anchors: int = 20) -> str:
    """pq_adc_topk_kmeans: literal codebooks, anchors (id < n_anchors)
    full precision, candidates scored from codes via subspace dots,
    round 6, top-10 with neighbor tie-break."""
    m, ds = len(cb), len(cb[0][0])
    return f"""
WITH {_encode_cte(_CORPUS.strip(), _codebook_values(cb), m, ds)}, anchors AS (
  SELECT vec_id AS aid, u FROM vn WHERE vec_id < {n_anchors}
), contrib AS (
  SELECT a.aid AS anchor, codes.vec_id AS neighbor,
         list_dot_product(
           a.u[codes.s * {ds} + 1 : (codes.s + 1) * {ds}], cw.c) AS part
  FROM codes
  JOIN cw ON cw.s = codes.s AND cw.ci = codes.ci
  CROSS JOIN anchors a
  WHERE a.aid != codes.vec_id
), scored AS (
  SELECT anchor, neighbor, round(sum(part), 6) AS adc_score
  FROM contrib GROUP BY anchor, neighbor
), ranked AS (
  SELECT anchor, neighbor, adc_score,
         row_number() OVER (PARTITION BY anchor
                            ORDER BY adc_score DESC, neighbor ASC) AS rank
  FROM scored
)
SELECT anchor, neighbor, adc_score, rank FROM ranked
WHERE rank <= 10 ORDER BY anchor, rank
"""


def ivf_pq_oracle(coarse, cb) -> str:
    """ivf_pq_topk_kmeans: literal coarse cells (raw-cosine assignment,
    4-probe) prune candidates; literal PQ codebooks score them by ADC
    (every vector is an anchor), round 6, top-10."""
    m, ds = len(cb), len(cb[0][0])
    return f"""
WITH {_encode_cte(_CORPUS.strip(), _codebook_values(cb), m, ds)},
cent(cci, cc) AS (
  VALUES
    {_centroid_values(coarse)}
), sims AS (
  SELECT vn.vec_id, cent.cci, list_dot_product(vn.u, cent.cc) AS s
  FROM vn CROSS JOIN cent
), cells AS (
  SELECT vec_id, cci,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY s DESC, cci ASC) AS rk
  FROM sims
), pairs AS (
  SELECT p.vec_id AS anchor, a.vec_id AS neighbor
  FROM (SELECT vec_id, cci FROM cells WHERE rk <= 4) p
  JOIN (SELECT vec_id, cci FROM cells WHERE rk = 1) a USING (cci)
  WHERE p.vec_id != a.vec_id
), contrib AS (
  SELECT pr.anchor, pr.neighbor,
         list_dot_product(
           an.u[codes.s * {ds} + 1 : (codes.s + 1) * {ds}], cw.c) AS part
  FROM pairs pr
  JOIN codes ON codes.vec_id = pr.neighbor
  JOIN cw ON cw.s = codes.s AND cw.ci = codes.ci
  JOIN vn an ON an.vec_id = pr.anchor
), scored AS (
  SELECT anchor, neighbor, round(sum(part), 6) AS adc_score
  FROM contrib GROUP BY anchor, neighbor
), ranked AS (
  SELECT anchor, neighbor, adc_score,
         row_number() OVER (PARTITION BY anchor
                            ORDER BY adc_score DESC, neighbor ASC) AS rank
  FROM scored
)
SELECT anchor, neighbor, adc_score, rank FROM ranked
WHERE rank <= 10 ORDER BY anchor, rank
"""


def load_artifacts() -> dict | None:
    if not os.path.exists(_FIXTURE):
        return None
    with open(_FIXTURE) as f:
        return json.load(f)


def attach_oracles() -> None:
    """Attach the generated-literal oracles to the already-registered
    `_kmeans` queries (no-op if the fixture is absent)."""
    art = load_artifacts()
    if art is None:
        return
    coarse, cb = art["coarse16"], art["cb_m8_k16"]
    oracles = {
        "ivf_ann_topk_kmeans": ivf_ann_oracle(coarse),
        "ivf_pq_topk_kmeans": ivf_pq_oracle(coarse, cb),
        "pq_adc_topk_kmeans": pq_adc_oracle(cb, n_anchors=20),
        "pq_recon_kmeans": pq_recon_oracle(cb),
        "opq_pq_recon_kmeans": pq_recon_oracle(
            art["opq_cb_m8_k16"], rotation=art["opq_R"]
        ),
    }
    for name, sql in oracles.items():
        q = QUERIES[name]
        q.oracle = sql
        q.oracle_sf_dir = ORACLE_SF_DIR


attach_oracles()
