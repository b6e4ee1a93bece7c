"""Build a 100× embeddings fixture with planted NEAR twins.

The replicated /tmp/sf100x corpus certifies ANN routing on EXACT
duplicates (cos = 1.0 — any hash-style shortcut also passes).  This
fixture makes the same certification non-trivial: each of the 100
copies of a base vector is perturbed by a small deterministic,
per-(vec_id, dim) offset, so a query's true neighbors are its 99
near twins at cos ≈ 0.995–0.999 — findable only if the bucketing
layers (hyperplane bands, IVF lists, sign bits, PQ codes) are robust
to perturbation, which is precisely the ANN promise at scale.

Perturbation: xhash-seeded uniform in [-eps, +eps] per component
(eps=0.03 on unit-norm 64-dim vectors → expected cos ≈ 1 - 64·eps²/6
≈ 0.990+), fully deterministic (no RNG) so reruns are identical.

Output: $NEAR_DIR (default /tmp/sf100x_near)/embeddings.parquet with
the standard (vec_id, embedding float[], label) shape; replica r of
base vector b gets vec_id = b + r·1_000_000 (the make_sfbig key-shift
convention), and replica 0 is UNperturbed so vec_id < 10 queries are
the clean probes.

Usage: python scripts/make_near100x.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lstore_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("NEAR_BASE", "/root/testdata/sf0.1")
OUT = os.environ.get("NEAR_DIR", "/tmp/sf100x_near")
REPLICAS = int(os.environ.get("NEAR_REPLICAS", "100"))
EPS = float(os.environ.get("NEAR_EPS", "0.03"))


def main() -> None:
    spark = get_spark("make-near100x")
    spark.sparkContext.setLogLevel("ERROR")
    em = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    reps = spark.range(REPLICAS).select(F.col("id").alias("r"))
    # deterministic per-(new id, dim) jitter in [-eps, eps]; replica 0
    # keeps the exact base vector (clean query probes)
    out = (
        em.crossJoin(reps)
        .select((F.col("vec_id") + F.col("r") * 1_000_000).alias("vec_id"),
                "label", "r", "embedding")
        .select(
            "vec_id", "label",
            F.expr(f"""
                transform(embedding, (x, i) -> CAST(
                  CAST(x AS DOUBLE) + IF(r = 0, 0.0D,
                    ({EPS} * 2.0D) *
                    (pmod(xxhash64(vec_id, i), 10000L) / 10000.0D - 0.5D))
                  AS FLOAT))""").alias("embedding"))
        .select("vec_id", "embedding", "label")
    )
    os.makedirs(OUT, exist_ok=True)
    # single FILE (not a directory): catalog.table_rows reads the footer
    # with pq.ParquetFile, matching the make_sfbig fixture convention
    import shutil
    import tempfile
    tmp = tempfile.mkdtemp(dir=OUT)
    out.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.replace(os.path.join(tmp, part),
               os.path.join(OUT, "embeddings.parquet"))
    shutil.rmtree(tmp)
    import pyarrow.parquet as pq
    n = pq.ParquetFile(os.path.join(OUT, "embeddings.parquet")) \
          .metadata.num_rows
    print(f"wrote {n} vectors -> {OUT} (replicas={REPLICAS}, eps={EPS})")
    spark.stop()


if __name__ == "__main__":
    main()
