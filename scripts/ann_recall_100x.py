"""ANN recall floors at the 100× fixture (VERDICT r6 #2).

Wall-clock growth curves for the sublinear ANN paths exist at 100×
(BASELINE.md); this closes the other half — sublinear-but-WRONG is the
classic ANN failure at scale, so recall itself must be certified on the
big fixture, not just at ~sf1.

Protocol (sampled-query + quality ratio): the registered exact baseline
`q_llm_sim_cosine_topk` and every ANN key share the same convention —
queries are vec_id < 10, corpus is the rest — so at /tmp/sf100x (200k
vectors; every base vector has 99 replicas) all methods answer the
identical question.  Because the replicated fixture makes the true
top-k massively TIED (99 twins at cos 1.0), set-intersection recall is
ill-defined; the tie-robust metric is the standard quality ratio

    recall_q = Σ cos(query, ANN top-k)  /  Σ cos(query, exact top-k)

with ANN candidates re-scored in exact cosine (what a production BQ/PQ
pipeline does anyway).  A method that routes replicas to the right
bucket/list/code scores ~1.0; a broken one falls toward the random
baseline (~0.4 on these near-random unit vectors).

LSH is pair-based over all ids, so its slice is id_a < 10 with id_b
restricted to the corpus side.

Usage: python scripts/ann_recall_100x.py [sf_dir]   (default /tmp/sf100x)
Prints one JSON line {method: quality_ratio} for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lstore_spark.catalog import load_table  # noqa: E402
from lstore_spark.registry import QUERIES  # noqa: E402
from lstore_spark.session import get_spark  # noqa: E402


def compute_recalls(spark, sf_dir: str) -> dict[str, float]:
    from lstore_spark.llm.similarity import cosine

    em = load_table(spark, sf_dir, "embeddings")
    # exact per-query top-5 cosine mass (the denominator)
    exact = QUERIES["q_llm_sim_cosine_topk"](spark, sf_dir)
    exact_mass = {r.query_id: r.s for r in
                  exact.groupBy("query_id").agg(F.sum("cos_sim").alias("s"))
                  .collect()}

    def rescored_mass(cands, qcol, ccol):
        """Σ exact cosine of (query, cand) pairs, per query.  The
        broadcast side is pre-filtered to the shared query convention
        (vec_id < 10) — broadcasting the full 200k-vector table to join
        10 ids would be ~100 MB of pointless executor pressure."""
        q = (em.filter(F.col("vec_id") < 10)
             .select(F.col("vec_id").alias(qcol),
                     F.col("embedding").alias("qe")))
        c = em.select(F.col("vec_id").alias(ccol),
                      F.col("embedding").alias("ce"))
        return {r[qcol]: r.s for r in
                (cands.join(F.broadcast(q), qcol).join(c, ccol)
                 .select(qcol, cosine("qe", "ce").alias("cos"))
                 .groupBy(qcol).agg(F.sum("cos").alias("s"))).collect()}

    out = {}

    def ratio(name, mass):
        qs = sorted(exact_mass)
        r = [mass.get(q, 0.0) / exact_mass[q] for q in qs]
        out[name] = round(sum(r) / len(r), 4)

    ivf = QUERIES["q_llm_sim_ivf_topk"](spark, sf_dir) \
        .select("query_id", "cand_id")
    ratio("ivf_nprobe3", rescored_mass(ivf, "query_id", "cand_id"))

    ham = QUERIES["q_llm_sim_hamming_topk"](spark, sf_dir) \
        .select("query_id", "cand_id")
    ratio("bq_hamming", rescored_mass(ham, "query_id", "cand_id"))

    pq = QUERIES["q_llm_emb_pq_adc"](spark, sf_dir) \
        .select("query_id", "cand_id")
    ratio("pq_adc", rescored_mass(pq, "query_id", "cand_id"))

    # r8: the persisted-index search (IVF routing + SQ8 ADC re-rank from
    # stored files) joins the recall certification — the production read
    # path must route replicas to the right stored list just like the
    # in-query methods.
    idx = QUERIES["q_llm_index_search"](spark, sf_dir) \
        .select("query_id", "cand_id")
    ratio("stored_index_sq8", rescored_mass(idx, "query_id", "cand_id"))

    lsh = (QUERIES["q_llm_sim_lsh_topk"](spark, sf_dir)
           .filter((F.col("id_a") < 10) & (F.col("id_b") >= 10))
           .select(F.col("id_a").alias("query_id"),
                   F.col("id_b").alias("cand_id")))
    # LSH emits ≤5 pairs per id over ALL ids; after the corpus-side
    # restriction a query may hold < k rows — quality ratio still
    # penalizes the missing mass, which is the point.
    ratio("lsh_banded", rescored_mass(lsh, "query_id", "cand_id"))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100x"
    spark = get_spark("ann-recall-100x")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"sf_dir": sf_dir, **compute_recalls(spark, sf_dir)}),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
