"""Build a realistic-duplication 100× documents fixture.

The replicated /tmp/sf100x corpus gives EVERY document 99 exact twins,
so every w-token span survives substring dedup — an adversarial
worst case where the two-pass hashed-key shape degenerates (pass 2
re-joins 100% of occurrences).  Real web corpora sit at ~1–5% of spans
duplicated (Lee et al. 2022), which is the regime the hashed shuffle
was designed for.  This script builds that regime at the same scale:

  * base = sf0.1 documents (~50k docs), replicated ``REPLICAS``×,
  * every 25th token is salted with the replica's identity, so all
    50-token windows of different replicas differ — UNLESS
  * the base doc is in the planted ``DUP_PCT`` slice, where replicas 0
    and 1 share a salt: exactly one cross-doc duplicate pair per
    planted base doc (span-level survivor fraction ≈ DUP_PCT / 100).

Output: $REALDUP_DIR (default /tmp/sf100x_realdup)/documents.parquet
with the standard (doc_id, source, lang, text) shape, doc_id unique.

Usage: python scripts/make_realdup.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lstore_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("REALDUP_BASE", "/root/testdata/sf0.1")
OUT = os.environ.get("REALDUP_DIR", "/tmp/sf100x_realdup")
REPLICAS = int(os.environ.get("REALDUP_REPLICAS", "100"))
DUP_PCT = int(os.environ.get("REALDUP_DUP_PCT", "5"))


def main() -> None:
    spark = get_spark("make-realdup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    n_base = docs.count()
    reps = spark.range(REPLICAS).select(F.col("id").alias("r"))
    # the per-doc token weave keys on the BASE doc identity (captured
    # before renumbering) so shared-salt replicas stay byte-identical
    base = docs.select(F.col("doc_id").alias("base_id"), "source", "lang",
                       "text")
    salted = (
        base.crossJoin(reps)
        .select(
            (F.col("base_id") + F.col("r") * n_base * 10).alias("doc_id"),
            "source", "lang",
            F.when((F.col("base_id") % (100 // DUP_PCT) == 0)
                   & (F.col("r") < 2), F.lit(-1))
            .otherwise(F.col("r")).alias("salt"),
            "base_id", "text")
        .select(
            "doc_id", "source", "lang",
            F.array_join(
                F.expr("""transform(
                    filter(split(text, ' '), x -> x <> ''),
                    (x, i) -> IF(i % 25 = 0,
                                 concat(x, '_', base_id, 's', salt),
                                 x))"""),
                " ").alias("text"))
    )
    os.makedirs(OUT, exist_ok=True)
    (salted.repartition(32)
     .write.mode("overwrite")
     .parquet(os.path.join(OUT, "documents.parquet")))
    print(f"wrote {salted.count()} docs -> {OUT} "
          f"(base={n_base}, replicas={REPLICAS}, dup_pct={DUP_PCT})")
    spark.stop()


if __name__ == "__main__":
    main()
