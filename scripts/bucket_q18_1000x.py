"""The layout answer to the q18 spill finding, measured (r10 follow-on
to scripts/spill_probe.py): bucket lineitem AND orders by orderkey and
re-run the q18 rollup chain — the per-order aggregate and the
orders⋈rollup join then consume the buckets' hash partitioning
directly, so the 6.3 GB aggregate exchange (and its 60 GB/8 GB
map+reduce spill at 32-wide) disappears from the plan entirely.

Protocol: one-time bucketed write of the two q18 columns-pruned tables
(repartition(n_buckets, key) first so each bucket is one file, not
one-per-input-task), then 3 timed noop runs of the bucketed q18 chain
with per-stage spill metrics from the UI REST API.  Compare against the
same-night plain-parquet readings (257 s @ 32 partitions, 93.5 s @ 128
— BASELINE.md round-10 spill audit).

Usage: python scripts/bucket_q18_1000x.py [n_buckets]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lstore_spark.catalog import load_table  # noqa: E402
from scripts.spill_probe import _get_spark_with_ui, _stages  # noqa: E402

DIR_1000X = os.environ.get("SF1000X_DIR", "/tmp/sf1000x")


def main() -> None:
    n_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    spark = _get_spark_with_ui()
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    import shutil
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for tbl in ("li_q18_bkt", "od_q18_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(warehouse.removeprefix("file:") + "/" + tbl,
                      ignore_errors=True)

    t0 = time.time()
    li = load_table(spark, DIR_1000X, "lineitem").select(
        "l_orderkey", "l_quantity")
    (li.repartition(n_buckets, "l_orderkey")
       .write.bucketBy(n_buckets, "l_orderkey").sortBy("l_orderkey")
       .format("parquet").saveAsTable("li_q18_bkt"))
    od = load_table(spark, DIR_1000X, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate")
    (od.repartition(n_buckets, "o_orderkey")
       .write.bucketBy(n_buckets, "o_orderkey").sortBy("o_orderkey")
       .format("parquet").saveAsTable("od_q18_bkt"))
    write_sec = round(time.time() - t0, 2)
    print(f"bucketed write ({n_buckets} buckets): {write_sec}s", flush=True)

    cu = load_table(spark, DIR_1000X, "customer")
    per_order = (
        spark.table("li_q18_bkt").groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,8)")).alias("_qty"))
        .filter(F.col("_qty") > 220)
    )
    q18 = (
        spark.table("od_q18_bkt")
        .join(per_order, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey",
                F.col("o_orderdate").cast("date").alias("order_date"),
                F.col("_qty").cast("double").alias("total_qty"))
    )
    plan = q18._jdf.queryExecution().executedPlan().toString()
    agg_exchanges = plan.count("Exchange hashpartitioning(l_orderkey")
    print(f"exchanges on the rollup key in the plan: {agg_exchanges}",
          flush=True)

    runs = []
    for i in range(3):
        seen = {s["stageId"] for s in _stages(app_id)}
        t0 = time.time()
        q18.write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        stages = [s for s in _stages(app_id) if s["stageId"] not in seen
                  and s.get("numCompleteTasks")]
        spill = round(sum(s.get("diskBytesSpilled", 0)
                          for s in stages) / 2**30, 2)
        sread = round(sum(s.get("shuffleReadBytes", 0)
                          for s in stages) / 2**30, 2)
        runs.append({"sec": sec, "disk_spill_gb": spill,
                     "shuffle_read_gb": sread})
        print(f"run {i}: {sec}s  disk_spill {spill} GiB  "
              f"shuffle_read {sread} GiB", flush=True)
    print(json.dumps({"n_buckets": n_buckets, "write_sec": write_sec,
                      "rollup_key_exchanges": agg_exchanges,
                      "runs": runs}))


if __name__ == "__main__":
    main()
