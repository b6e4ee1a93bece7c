"""Re-measure the two residual spill shapes at 1000× through the
DEFAULT plans (VERDICT r10 #2 'Done' criterion).

Round 10 measured the bucketed-layout fix in bespoke probe scripts
(scripts/bucket_q18_1000x.py, scripts/bucket_distinct_1000x.py); round
11 wired it into the keys themselves: ``catalog.build_bucket_layout``
publishes the artifact once and ``q_tpch_q18_large_orders`` /
``q_agg_global`` route onto it automatically.  This script proves the
END-TO-END path at 1000×: build the layout through the public API,
invoke the REGISTERED keys (no bespoke plan), assert zero orderkey
exchanges in the executed plans, and time 3 noop runs each.

Usage: python scripts/bucket_default_1000x.py
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIR_1000X = os.environ.get("SF1000X_DIR", "/tmp/sf1000x")


def main() -> None:
    from lstore_spark import catalog
    from lstore_spark.registry import QUERIES, load_all
    from lstore_spark.session import get_spark

    load_all()
    spark = get_spark("bucket-default-1000x", cpus="32",
                      shuffle_partitions="32")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    catalog.build_bucket_layout(spark, DIR_1000X)
    build_sec = round(time.time() - t0, 1)
    n = catalog.bucket_layout_n(DIR_1000X)

    out = {"layout_build_sec": build_sec, "n_buckets": n, "keys": {}}
    for key in ("q_tpch_q18_large_orders", "q_agg_global"):
        df = QUERIES[key](spark, DIR_1000X)
        plan = df._jdf.queryExecution().executedPlan().toString()
        routed = "Bucketed: true" in plan
        okey_exchanges = (plan.count("Exchange hashpartitioning(l_orderkey")
                          + plan.count("Exchange hashpartitioning(o_orderkey"))
        runs = []
        for _ in range(3):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.time() - t0, 1))
        out["keys"][key] = {
            "routed_onto_layout": routed,
            "orderkey_exchanges": okey_exchanges,
            "runs_sec": runs,
        }
        print(json.dumps({key: out["keys"][key]}), file=sys.stderr,
              flush=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
