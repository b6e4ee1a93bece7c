"""Interleaved A/B: q_llm_dedup_semantic — the r13 composition
(assign → corpus self-join → localCheckpoint → per-cluster Gram dup
ids → roster left-join) vs the r14 fused shipped form (assignment
carries the embedding; the Gram stage emits keep flags directly).
Noop sink, shared session, interleaved reps; exceptAll parity asserted
both ways first.

Usage: python scripts/ab_semantic_r14.py [-n REPS]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lstore_spark.catalog import load_table  # noqa: E402
from lstore_spark.llm.dedup import (_TAU_EMB_NEAR_DUP,  # noqa: E402
                                    _dup_ids_vectorized)
from lstore_spark.llm.similarity import _norm  # noqa: E402
from lstore_spark.registry import QUERIES, load_all  # noqa: E402
from lstore_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def r13_form(spark, sf_dir, n_clusters: int = 8):
    """The pre-r14 semantic_dedup composition, verbatim."""
    from lstore_spark.llm.embeddings import assign_nearest, wf_vectors

    em = (load_table(spark, sf_dir, "embeddings")
          .filter(F.col("vec_id") < 2000))
    w = Window.orderBy("vec_id")
    cvecs = (wf_vectors(em).orderBy("vec_id").limit(n_clusters)
             .select((F.row_number().over(w) - 1).alias("ck"),
                     F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
                     .alias("cvec")))
    asg = assign_nearest(em, cvecs, "ck").select("vec_id", "cluster")
    v = (em.join(asg, "vec_id")
         .select("vec_id", "cluster", "embedding",
                 _norm("embedding").alias("_n"))
         .localCheckpoint())
    dup = (_dup_ids_vectorized(v, _TAU_EMB_NEAR_DUP)
           .withColumn("dup", F.lit(True)))
    return (v.select("vec_id", "cluster")
            .join(dup, "vec_id", "left")
            .select("vec_id", "cluster",
                    F.col("dup").isNull().alias("keep")))


def main() -> None:
    n = 7
    if len(sys.argv) > 2 and sys.argv[1] == "-n":
        n = int(sys.argv[2])
    load_all()
    spark = get_spark("ab-semantic-r14")
    spark.sparkContext.setLogLevel("ERROR")

    @F.pandas_udf("long")
    def _warm(x):
        import numpy as np  # noqa: F401
        return x

    spark.range(32).repartition(32).select(_warm("id")) \
         .write.mode("overwrite").format("noop").save()

    old = r13_form(spark, SF_DIR)
    new = QUERIES["q_llm_dedup_semantic"](spark, SF_DIR)
    d1 = old.exceptAll(new).count()
    d2 = new.exceptAll(old).count()
    print(f"# parity: old\\new={d1} new\\old={d2}", file=sys.stderr)
    assert d1 == 0 and d2 == 0, "forms disagree"

    times = {"r13_join_back": [], "r14_fused": []}
    for i in range(n):
        for label, fn in (("r13_join_back",
                           lambda: r13_form(spark, SF_DIR)),
                          ("r14_fused",
                           lambda: QUERIES["q_llm_dedup_semantic"](
                               spark, SF_DIR))):
            spark.sparkContext.setJobDescription(f"ab:{label}:{i}")
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            times[label].append(round(time.perf_counter() - t0, 3))
    out = {k: {"times": v, "median": round(statistics.median(v), 3),
               "min": min(v)} for k, v in times.items()}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
