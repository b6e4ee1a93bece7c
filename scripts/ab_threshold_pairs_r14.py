"""Interleaved A/B: q_llm_sim_threshold_pairs re-rank — the shipped
join form (two broadcast joins + per-pair HOF cosine) vs the REJECTED
r14 closure candidate (pair cosines via a pandas UDF over the candidate
ids, vectors riding the closure — built here so the rejection stays
reproducible).  Noop sink, shared session, interleaved reps so ambient
drift hits both arms equally.  Asserts exceptAll parity both ways
before timing.  Result (OPTIMIZATION_r14.md): closure is SLOWER —
join 1.27 s median / 1.11 s min vs closure 2.12 / 1.64 (7 reps), the
added ArrowEvalPython stage's fixed cost dominating the saved HOF
folds at this key's bounded 200-row slice.

Usage: python scripts/ab_threshold_pairs_r14.py [-n REPS]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lstore_spark.catalog import load_table, table_rows  # noqa: E402
from lstore_spark.llm.similarity import (  # noqa: E402
    _TAU_PAIRS, _norm, cosine_with_norms, hyperplane_candidate_pairs)
from lstore_spark.registry import QUERIES, load_all  # noqa: E402
from lstore_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def closure_form(spark, sf_dir):
    """The rejected candidate: re-rank cosines from a pandas UDF whose
    closure holds the (bounded, ≤200-row) slice — same left-to-right
    elementwise fold as all_pairs_cosine_udf (bit-identical to the HOF
    fold), per-row norms precomputed at factory time, JVM ROUND, zero-
    norm pairs → NULL."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    from lstore_spark.llm.similarity import read_query_slice

    em = (load_table(spark, sf_dir, "embeddings")
          .filter((F.col("vec_id") < 200)
                  & (F.size("embedding") == 64)
                  & (F.expr("size(filter(embedding, x -> x IS NULL))")
                     == 0)))
    n = min(200, table_rows(sf_dir, "embeddings"))
    cands = hyperplane_candidate_pairs(
        em, "vec_id", "embedding", n_rows=n,
        tau=_TAU_PAIRS, target_recall=1.0 - 1e-6)
    qt = read_query_slice(sf_dir, bound=200)
    M = np.stack([np.asarray(v, dtype=np.float64) for v in qt.embedding])
    id2row = {int(v): i for i, v in enumerate(qt.vec_id)}
    n_rows, dim = M.shape
    nacc = np.zeros(n_rows)
    for d in range(dim):
        nacc = nacc + M[:, d] * M[:, d]
    norms = np.sqrt(nacc)

    @F.pandas_udf(DoubleType())
    def cos_pair(ida, idb):
        a, b = ida.to_numpy(), idb.to_numpy()
        ok = np.array([x in id2row and y in id2row for x, y in zip(a, b)])
        out = [None] * len(a)
        if ok.any():
            ia = np.array([id2row[x] for x in a[ok]], dtype=np.int64)
            ib = np.array([id2row[x] for x in b[ok]], dtype=np.int64)
            A, B = M[ia], M[ib]
            dots = np.zeros(len(ia))
            for d in range(dim):
                dots = dots + A[:, d] * B[:, d]
            denom = norms[ia] * norms[ib]
            for i, j in zip(np.nonzero(ok)[0], range(len(ia))):
                if denom[j] != 0:
                    out[i] = float(dots[j] / denom[j])
        return pd.Series(out, dtype="float64")

    return (cands.select(
        "id_a", "id_b",
        F.round(cos_pair("id_a", "id_b"), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= _TAU_PAIRS))


def join_form(spark, sf_dir):
    """The shipped shape (same as q_llm_sim_threshold_pairs)."""
    em = (load_table(spark, sf_dir, "embeddings")
          .filter((F.col("vec_id") < 200)
                  & (F.size("embedding") == 64)
                  & (F.expr("size(filter(embedding, x -> x IS NULL))")
                     == 0)))
    n = min(200, table_rows(sf_dir, "embeddings"))
    cands = hyperplane_candidate_pairs(
        em, "vec_id", "embedding", n_rows=n,
        tau=_TAU_PAIRS, target_recall=1.0 - 1e-6)
    a = em.select(F.col("vec_id").alias("id_a"),
                  F.col("embedding").alias("a_emb"),
                  _norm("embedding").alias("a_norm"))
    b = em.select(F.col("vec_id").alias("id_b"),
                  F.col("embedding").alias("b_emb"),
                  _norm("embedding").alias("b_norm"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b",
                cosine_with_norms("a_emb", "b_emb", "a_norm", "b_norm")
                .alias("cos_sim"))
        .filter(F.col("cos_sim") >= _TAU_PAIRS)
    )


def main() -> None:
    n = 7
    if len(sys.argv) > 2 and sys.argv[1] == "-n":
        n = int(sys.argv[2])
    load_all()
    spark = get_spark("ab-threshold-pairs-r14")
    spark.sparkContext.setLogLevel("ERROR")

    @F.pandas_udf("long")
    def _warm(x):
        import numpy as np  # noqa: F401
        return x

    spark.range(32).repartition(32).select(_warm("id")) \
         .write.mode("overwrite").format("noop").save()

    old = join_form(spark, SF_DIR)
    new = closure_form(spark, SF_DIR)
    d1 = old.exceptAll(new).count()
    d2 = new.exceptAll(old).count()
    print(f"# parity: join\\closure={d1} closure\\join={d2}", file=sys.stderr)
    assert d1 == 0 and d2 == 0, "forms disagree"
    # sanity: the registered key IS the join form
    d3 = QUERIES["q_llm_sim_threshold_pairs"](spark, SF_DIR) \
        .exceptAll(old).count()
    assert d3 == 0, "registered key drifted from the join form"

    times = {"join": [], "closure": []}
    for i in range(n):
        for label, df_fn in (("join", lambda: join_form(spark, SF_DIR)),
                             ("closure",
                              lambda: closure_form(spark, SF_DIR))):
            spark.sparkContext.setJobDescription(f"ab:{label}:{i}")
            t0 = time.perf_counter()
            df_fn().write.mode("overwrite").format("noop").save()
            times[label].append(round(time.perf_counter() - t0, 3))
    out = {k: {"times": v, "median": round(statistics.median(v), 3),
               "min": min(v)} for k, v in times.items()}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
