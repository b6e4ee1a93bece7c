"""The layout answer to the WIDTH-INSENSITIVE spill class, measured
(r10 follow-on to the spill census): q_agg_global's exact-distinct
branch spills ~52-65 GB map-side at EITHER shuffle width because the
partial hash aggregate fills per-task execution memory BEFORE the
exchange — near-unique l_orderkey means the map-side combine reduces
almost nothing (BASELINE.md round-10 census, class 2).  The census
names two levers: per-task memory, or the bucketed/sorted layout.
This script measures the second on the class exemplar, mirroring
scripts/bucket_q18_1000x.py (which measured class 1):

  bucket lineitem's l_orderkey column (256 buckets, sorted) -> the
  distinct's required hash distribution is satisfied by the scan, so
  the Exchange vanishes AND each task's distinct set is one bucket's
  keys (~150M/256 = 590k) instead of one input split's ~6M near-unique
  rows — the hash map fits per-task memory and the spill goes to zero.

Protocol: same-night plain-layout control (the exact distinct-then-
count branch of q_agg_global, operators/aggregates.py), one-time
bucketed write of the single key column, then 3 timed noop runs of
the bucketed form with per-stage spill metrics from the UI REST API;
asserts the bucketed plan has zero exchanges on the distinct key.

Usage: python scripts/bucket_distinct_1000x.py [n_buckets]
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


def _timed_noop(spark, df, app_id: str) -> dict:
    seen = {s["stageId"] for s in _stages(app_id)}
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    sec = round(time.time() - t0, 2)
    stages = [s for s in _stages(app_id) if s["stageId"] not in seen
              and s.get("numCompleteTasks")]
    return {
        "sec": sec,
        "mem_spill_gb": round(sum(s.get("memoryBytesSpilled", 0)
                                  for s in stages) / 2**30, 2),
        "disk_spill_gb": round(sum(s.get("diskBytesSpilled", 0)
                                   for s in stages) / 2**30, 2),
        "shuffle_read_gb": round(sum(s.get("shuffleReadBytes", 0)
                                     for s in stages) / 2**30, 2),
    }


def main() -> None:
    n_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    spark = _get_spark_with_ui()
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    li = load_table(spark, DIR_1000X, "lineitem")

    # --- same-night control: the exact distinct-then-count branch on the
    # plain parquet layout (the shape inside q_agg_global).
    plain = (li.select("l_orderkey").distinct()
             .agg(F.count(F.lit(1)).alias("n_orders")))
    ctl = _timed_noop(spark, plain, app_id)
    print(f"plain layout: {json.dumps(ctl)}", flush=True)

    # --- one-time bucketed write of the key column.
    import shutil
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    spark.sql("DROP TABLE IF EXISTS li_dk_bkt")
    shutil.rmtree(warehouse.removeprefix("file:") + "/li_dk_bkt",
                  ignore_errors=True)
    t0 = time.time()
    (li.select("l_orderkey")
       .repartition(n_buckets, "l_orderkey")
       .write.bucketBy(n_buckets, "l_orderkey").sortBy("l_orderkey")
       .format("parquet").saveAsTable("li_dk_bkt"))
    write_sec = round(time.time() - t0, 2)
    print(f"bucketed write ({n_buckets} buckets): {write_sec}s", flush=True)

    bkt = (spark.table("li_dk_bkt").distinct()
           .agg(F.count(F.lit(1)).alias("n_orders")))
    plan = bkt._jdf.queryExecution().executedPlan().toString()
    key_exchanges = plan.count("Exchange hashpartitioning(l_orderkey")
    print(f"exchanges on the distinct key in the plan: {key_exchanges}",
          flush=True)

    runs = [_timed_noop(spark, bkt, app_id) for _ in range(3)]
    for i, r in enumerate(runs):
        print(f"run {i}: {json.dumps(r)}", flush=True)

    # Both forms must agree on the exact count (the contract is EXACT).
    n_plain = plain.collect()[0][0]
    n_bkt = bkt.collect()[0][0]
    assert n_plain == n_bkt, (n_plain, n_bkt)
    print(json.dumps({
        "n_buckets": n_buckets, "write_sec": write_sec,
        "distinct_key_exchanges": key_exchanges,
        "n_orders": n_plain, "plain": ctl, "bucketed_runs": runs,
    }))


if __name__ == "__main__":
    main()
