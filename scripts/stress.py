"""Stress evidence beyond the driver's SFs: replicate events to ~1M rows
(10× sf0.1), then

1. re-verify cross-engine hash parity of the float-aggregation
   discipline at 10× the bench volume (the regime that broke the naive
   decimal→double cast), and
2. measure AQE vs salted-join behavior under pathological key skew
   (one user owning 50% of all rows).

Usage: python scripts/stress.py   (writes generated parquet under /tmp)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lstore_spark.session import get_spark  # noqa: E402
from lstore_spark import scale  # noqa: E402
from tests.oracle_check import compare  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
REPLICAS = 10


def build_events_1m(spark, out: str) -> None:
    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .select("event_id", "user_id", "event_type", "value", "props"))
    big = ev.crossJoin(F.broadcast(
        spark.range(REPLICAS).select(F.col("id").alias("k"))))
    big = big.select(
        (F.col("event_id") + F.col("k") * 100_000).alias("event_id"),
        "user_id", "event_type",
        # perturb values deterministically so replicas aren't identical
        F.round(F.col("value") + F.col("k") * 0.01, 2).alias("value"),
        "props",
    )
    big.repartition(8).write.mode("overwrite").parquet(out)


def main() -> None:
    spark = get_spark("lstore-stress", cpus="16", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = os.path.join(tempfile.gettempdir(), "lstore_events_1m")
    build_events_1m(spark, out)
    ev = spark.read.parquet(out)
    n = ev.count()
    print(f"events_1m rows: {n}")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events_1m AS SELECT * FROM '{out}/*.parquet'")

    # --- 1. float-determinism parity at 1M rows -------------------------
    checks = {
        "stress_groupby_8agg": (
            ev.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(30,8)")).cast("double").alias("sum_v"),
                (F.sum(F.col("value").cast("decimal(30,8)")).cast("double")
                 / F.count("value")).alias("avg_v"),
                F.countDistinct("user_id").alias("nu"),
                F.min("value").alias("min_v"),
                F.max("value").alias("max_v"),
            ),
            """SELECT event_type, COUNT(*) AS n,
                      CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sum_v,
                      CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)/COUNT(value) AS avg_v,
                      COUNT(DISTINCT user_id) AS nu,
                      MIN(value) AS min_v, MAX(value) AS max_v
               FROM events_1m GROUP BY event_type""",
        ),
        "stress_running_sum": (
            ev.filter(F.col("user_id") < 10).select(
                "event_id", "user_id",
                F.sum(F.col("value").cast("decimal(30,8)"))
                .over(Window.partitionBy("user_id").orderBy("event_id")
                      .rowsBetween(Window.unboundedPreceding, 0))
                .cast("double").alias("run_v")),
            """SELECT event_id, user_id,
                      CAST(CAST(SUM(CAST(value AS DECIMAL(30,8)))
                           OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE) AS run_v
               FROM events_1m WHERE user_id < 10""",
        ),
    }
    for key, (df, sql) in checks.items():
        t0 = time.perf_counter()
        res = compare(key, df, con, sql)
        dt = time.perf_counter() - t0
        print(f"{'OK ' if res.ok else 'FAIL'} {key}: rows={res.spark_rows} "
              f"{res.detail} ({dt:.1f}s incl. both engines)")

    # --- 2. skew: one user owns 50% of rows -----------------------------
    skewed = ev.withColumn(
        "user_id",
        F.when(F.pmod(F.col("event_id"), 2) == 0, F.lit(0)).otherwise(F.col("user_id")))
    dim = spark.range(150).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 5).cast("string").alias("segment"))

    t0 = time.perf_counter()
    n1 = skewed.join(dim, "user_id").groupBy("segment").count().collect()
    t_aqe = time.perf_counter() - t0

    t0 = time.perf_counter()
    n2 = (scale.salted_join(skewed, dim, "user_id", n_salts=16)
          .groupBy("segment").count().collect())
    t_salt = time.perf_counter() - t0
    same = sorted(map(tuple, n1)) == sorted(map(tuple, n2))
    print(f"skew join (50% single key, {n} rows): aqe={t_aqe:.1f}s "
          f"salted={t_salt:.1f}s results_equal={same}")
    spark.stop()


if __name__ == "__main__":
    main()
