"""Shuffle-spill audit of the two honest 1000× heavyweights (VERDICT r9
#7): q_tpch_q18_large_orders (91 s) and q_agg_having (38 s).  Both are
certified ~linear, scan/agg-bound by their semantics — the open question
is whether their exchanges SPILL at 600M rows on this 8g local driver,
and if so which memory/partition knob a real cluster would set.

Runs each key against /tmp/sf1000x with the Spark UI enabled and reads
per-stage memoryBytesSpilled / diskBytesSpilled / shuffle volumes from
the status REST API (the same numbers the History Server shows on a real
cluster), then prints one JSON object.

Usage: python scripts/spill_probe.py [key-substring ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lstore_spark.registry import QUERIES, release_pins  # noqa: E402
from lstore_spark.session import _RUNTIME_CONFS  # noqa: E402

DIR_1000X = os.environ.get("SF1000X_DIR", "/tmp/sf1000x")
KEYS = ["q_tpch_q18_large_orders", "q_agg_having"]


def _get_spark_with_ui():
    from pyspark.sql import SparkSession
    b = (SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
         .appName("spill-probe")
         .config("spark.driver.memory",
                 os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
         .config("spark.ui.enabled", "true")
         .config("spark.ui.port", "4049")
         .config("spark.sql.files.maxPartitionBytes",
                 str(128 * 1024 * 1024)))
    for k, v in _RUNTIME_CONFS.items():
        b = b.config(k, v)
    return b.getOrCreate()


def _stages(app_id: str) -> list[dict]:
    url = f"http://localhost:4049/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    wanted = sys.argv[1:]
    if wanted:
        # exact registry keys win; otherwise substring-filter the default pair
        keys = [k for k in wanted if k in QUERIES] or [
            k for k in KEYS if any(w in k for w in wanted)]
    else:
        keys = list(KEYS)
    spark = _get_spark_with_ui()
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    # warm-up so JVM startup isn't billed to the first key's stages
    QUERIES["q_scan_full"](spark, DIR_1000X).write \
        .format("noop").mode("overwrite").save()
    release_pins()
    out = {}
    for key in keys:
        seen = {s["stageId"] for s in _stages(app_id)}
        t0 = time.time()
        QUERIES[key](spark, DIR_1000X).write \
            .format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        release_pins()
        stages = [s for s in _stages(app_id) if s["stageId"] not in seen]
        out[key] = {
            "sec": sec,
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
            "stages": [
                {
                    "stage": s["stageId"],
                    "tasks": s.get("numCompleteTasks"),
                    "input_gb": round(s.get("inputBytes", 0) / 2**30, 2),
                    "shuffle_write_gb": round(
                        s.get("shuffleWriteBytes", 0) / 2**30, 2),
                    "shuffle_read_gb": round(
                        s.get("shuffleReadBytes", 0) / 2**30, 2),
                    "mem_spill_gb": round(
                        s.get("memoryBytesSpilled", 0) / 2**30, 2),
                    "disk_spill_gb": round(
                        s.get("diskBytesSpilled", 0) / 2**30, 2),
                }
                for s in sorted(stages, key=lambda s: s["stageId"])
                if s.get("numCompleteTasks")
            ],
        }
        print(key, json.dumps(out[key]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
