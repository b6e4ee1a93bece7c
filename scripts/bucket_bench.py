"""Quantify the bucketed-join win at sf0.1: the same lineitem⋈orders
join+agg with a genuine shuffle join (broadcast disabled) vs co-located
bucketed tables (no Exchange).  Median of 3 noop-sink runs each."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lstore_spark import scale  # noqa: E402
from lstore_spark.catalog import load_table  # noqa: E402
from lstore_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(df, label: str, n: int = 3) -> float:
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[n // 2]
    print(f"{label}: {med:.3f}s (median of {n})")
    return med


def main() -> None:
    spark = get_spark("bucket-bench", cpus="16", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice")
    od = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    shuffled = (li.join(od, li.l_orderkey == od.o_orderkey)
                .groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")))
    t_shuffle = timed(shuffled, "unbucketed shuffle join+agg")

    scale.write_bucketed_pair(spark, li, od, n_buckets=16)
    bucketed = (
        spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    )
    t_bucket = timed(bucketed, "bucketed join+agg (no exchange)")
    print(f"speedup: {t_shuffle / t_bucket:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
