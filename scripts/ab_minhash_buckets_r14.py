"""Interleaved A/B: q_llm_dedup_minhash with band buckets precomputed
in the signature UDF (with_buckets=True + posexplode banding; shipped)
vs the r13 form (interpreted hash(slice)/struct-transform HOFs re-paid
on every scan of the checkpointed signatures).

Both arms rebuild the full key pipeline from the parquet scan each rep
(noop sink); arms alternate so ambient drift hits both equally.

Usage: [AB_SF_DIRS=/root/testdata/sf0.1,/tmp/sf100x] [REPS=5]
       python scripts/ab_minhash_buckets_r14.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lstore_spark.catalog import load_table  # noqa: E402
from lstore_spark.llm.dedup import (  # noqa: E402
    lsh_candidate_pairs, minhash_signatures)
from lstore_spark.session import get_spark  # noqa: E402

SF_DIRS = os.environ.get(
    "AB_SF_DIRS", "/root/testdata/sf0.1,/tmp/sf100x").split(",")
REPS = int(os.environ.get("REPS", "5"))


def full_key(spark, sf_dir: str, with_buckets: bool):
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, with_buckets=with_buckets).localCheckpoint()
    pairs = lsh_candidate_pairs(sig)
    mates = (pairs.select(F.explode(F.array("id_a", "id_b")).alias("doc_id"),
                          "est_jaccard")
             .groupBy("doc_id")
             .agg(F.count(F.lit(1)).alias("n_mates"),
                  F.max("est_jaccard").alias("best_est_jaccard")))
    return (sig.select("doc_id").join(mates, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_mates", F.lit(0)).alias("n_mates"),
                    F.coalesce("best_est_jaccard",
                               F.lit(0.0)).alias("best_est_jaccard")))


def main() -> None:
    spark = get_spark("ab-minhash-buckets-r14")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf_dir in SF_DIRS:
        times = {"buckets": [], "hof": []}
        for arm, wb in (("buckets", True), ("hof", False)):  # codegen warm-up
            full_key(spark, sf_dir, wb).write.format("noop") \
                .mode("overwrite").save()
        for i in range(REPS):
            for arm, wb in (("buckets", True), ("hof", False)):
                spark.sparkContext.setJobDescription(
                    f"ab-mh:{arm}:{i}:{sf_dir}")
                t0 = time.perf_counter()
                full_key(spark, sf_dir, wb).write.format("noop") \
                    .mode("overwrite").save()
                times[arm].append(round(time.perf_counter() - t0, 3))
        out[sf_dir] = {
            a: {"runs": v, "median": round(statistics.median(v), 3),
                "min": min(v)} for a, v in times.items()}
        print(f"# {sf_dir}: {out[sf_dir]}", file=sys.stderr)
    print(json.dumps({"reps": REPS, "arms": out}))
    spark.stop()


if __name__ == "__main__":
    main()
