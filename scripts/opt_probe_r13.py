"""Round-13 optimization probe: time individual registered keys in
isolation with the noop sink (guide §1.4), N repeats each, one shared
session — the measure-first loop for this optimization round.

Usage: python scripts/opt_probe_r13.py [-n REPEATS] key [key ...]
Prints one JSON line: {key: {"times": [...], "median": s, "min": s}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lstore_spark.registry import QUERIES, load_all  # noqa: E402
from lstore_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    load_all()
    keys = args or sorted(QUERIES)
    spark = get_spark("opt-probe-r13")
    spark.sparkContext.setLogLevel("ERROR")
    # Same warm-ups as bench.py: JVM/codegen + Python worker pool.
    QUERIES["q_agg_groupby_hash"](spark, SF_DIR) \
        .write.mode("overwrite").format("noop").save()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(x):
        import numpy as np  # noqa: F401
        return x

    spark.range(32).repartition(32).select(_warm("id")) \
         .write.mode("overwrite").format("noop").save()
    out = {}
    for key in keys:
        spark.sparkContext.setJobDescription(f"probe:{key}")
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            QUERIES[key](spark, SF_DIR) \
                .write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[key] = {"times": times,
                    "median": round(statistics.median(times), 3),
                    "min": min(times)}
        print(f"# {key}: median={out[key]['median']} min={out[key]['min']}"
              f" {times}", file=sys.stderr)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
