"""Streaming-stateful state-store census at the 1000× fixture (VERDICT
r10 #5).

The wave-11 1000× probe covered the batch spine; the stateful streaming
family — the classic 100 TB killer, state growing with stream length
instead of the time horizon — was only measured at 10×/100×.  This
script drives SIX stateful shapes over the full 1000× event stream
(100M rows) split into time-ordered micro-batches, and records every
state operator's numRowsTotal / memoryUsedBytes / numRowsRemoved per
batch from StreamingQuery progress:

- ``join``        watermarked purchase⋈view inner join (q_stream_stream_join form)
- ``outer_join``  the fullOuter variant (both sides' unmatched state must evict)
- ``dedup``       dropDuplicatesWithinWatermark on event_id (q_stream_dedup_ids form)
- ``window_agg``  tumbling 1-hour counts with a 2h watermark (q_stream_tumbling_count form)
- ``session``     per-user 30-min session windows (q_stream_session_window form)
- ``chained``     dedup → windowed agg: two stateful operators in one query
  (q_stream_active_daily's shape class)

Bounded state shows as: peak state rows ≪ cumulative input (eviction
keeps only the watermark horizon), and nonzero numRowsRemoved as the
watermark advances.  The applyInPandasWithState running aggregate is
probed separately (``runagg``) — its state is keyed by user, so its
bound is DISTINCT USERS, not a time horizon; the census records that
cardinality explicitly.

Usage: python scripts/stream_state_1000x.py [sf1000x_dir] [n_chunks] [shapes...]
Writes scripts/stream_state_r11_1000x.json and prints one JSON line per
shape to stdout (details to stderr).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.stream_state_10x import prepare_chunks  # noqa: E402

DIR_1000X = os.environ.get("SF1000X_DIR", "/tmp/sf1000x")


def _purchase_view(src):
    p = (src.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
         .withWatermark("p_ts", "2 hours"))
    v = (src.filter(F.col("event_type") == "view")
         .select(F.col("event_id").alias("view_id"),
                 F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
         .withWatermark("v_ts", "2 hours"))
    cond = ((F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR")))
    return p, v, cond


def shape_join(src):
    p, v, cond = _purchase_view(src)
    return p.join(v, cond), "append"


def shape_outer_join(src):
    p, v, cond = _purchase_view(src)
    return p.join(v, cond, "fullOuter"), "append"


def shape_dedup(src):
    return (src.withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id", "user_id")), "append"


def shape_window_agg(src):
    return (src.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))), "append"


def shape_session(src):
    return (src.withWatermark("ts", "2 hours")
            .groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))), "append"


def shape_chained(src):
    deduped = (src.withWatermark("ts", "2 hours")
               .dropDuplicatesWithinWatermark(["event_id"]))
    return (deduped
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))), "append"


def shape_runagg(src):
    from pyspark.sql.streaming.state import GroupStateTimeout

    from lstore_spark.streaming.stateful import OUT_SCHEMA, STATE_SCHEMA
    import pandas as pd

    def update(key, pdfs, state):
        (user_id,) = key
        n, s8 = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s8 += int(pdf["v8"].sum())
        state.update((n, s8))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_v8": [s8]})

    v8 = (F.col("value").cast("decimal(30,8)")
          * F.lit(100000000)).cast("long").alias("v8")
    return (src.select("user_id", v8)
            .groupBy("user_id")
            .applyInPandasWithState(
                update, OUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout)), "update"


def shape_runagg_jvm(src):
    # the JVM-native A/B twin of shape_runagg (VERDICT r11 #5): same
    # per-user running totals, state in the JVM store, no Python path
    v8 = (F.col("value").cast("decimal(30,8)")
          * F.lit(100000000)).cast("long").alias("v8")
    return (src.select("user_id", v8)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("v8").alias("sum_v8"))), "update"


SHAPES = {
    "join": shape_join,
    "outer_join": shape_outer_join,
    "dedup": shape_dedup,
    "window_agg": shape_window_agg,
    "session": shape_session,
    "chained": shape_chained,
    "runagg": shape_runagg,
    "runagg_jvm": shape_runagg_jvm,
}


def run_shape(spark, name: str, src_glob: str) -> dict:
    import time

    src = (spark.readStream.schema(spark.read.parquet(src_glob).schema)
           .option("maxFilesPerTrigger", "1").parquet(src_glob))
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    df, mode = SHAPES[name](src)
    t0 = time.time()
    q = (df.writeStream.format("noop")
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination()
    wall = round(time.time() - t0, 1)
    prog = [json.loads(str(p)) for p in q.recentProgress]
    ids = [pr["batchId"] for pr in prog]
    if ids and (min(ids) != 0 or len(set(ids)) != max(ids) + 1):
        raise RuntimeError(
            f"{name}: progress history truncated (batches {min(ids)}–"
            f"{max(ids)}, {len(set(ids))} retained) — raise "
            "spark.sql.streaming.numRecentProgressUpdates; a partial "
            "census must not feed BASELINE.md")
    batches = []
    for pr in prog:
        ops = pr.get("stateOperators") or [{}]
        batches.append({
            "batch": pr["batchId"],
            "input_rows": pr.get("numInputRows", 0),
            # one entry per state operator — chained shapes carry two
            "state_rows": [op.get("numRowsTotal", 0) for op in ops],
            "state_bytes": [op.get("memoryUsedBytes", 0) for op in ops],
            "evicted": [op.get("numRowsRemoved", 0) for op in ops],
            "output_rows": pr["sink"].get("numOutputRows", -1),
        })
    total_in = sum(b["input_rows"] for b in batches)
    n_ops = max(len(b["state_rows"]) for b in batches) if batches else 0
    per_op = []
    for i in range(n_ops):
        rows = [b["state_rows"][i] for b in batches if len(b["state_rows"]) > i]
        byts = [b["state_bytes"][i] for b in batches if len(b["state_bytes"]) > i]
        evs = [b["evicted"][i] or 0 for b in batches if len(b["evicted"]) > i]
        per_op.append({
            "peak_state_rows": max(rows, default=0),
            "final_state_rows": rows[-1] if rows else 0,
            "peak_state_mb": round(max(byts, default=0) / 1e6, 1),
            "total_evicted": sum(evs),
            "peak_over_input_pct": round(
                100.0 * max(rows, default=0) / max(total_in, 1), 3),
        })
    return {
        "shape": name,
        "wall_sec": wall,
        "n_batches": len(batches),
        "total_input_rows": total_in,
        "total_output_rows": sum(max(b["output_rows"], 0) for b in batches),
        "state_operators": per_op,
        "batches": batches,
    }


def main() -> None:
    from lstore_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DIR_1000X
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    wanted = sys.argv[3:] or list(SHAPES)
    spark = get_spark("stream-state-1000x", cpus="32",
                      shuffle_partitions="32")
    spark.sparkContext.setLogLevel("ERROR")
    # recentProgress retains only ~100 updates by default — a census
    # over more chunks than that would silently drop its earliest
    # batches and mis-state the peaks (review r11).
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
                   str(max(256, n_chunks * 2)))
    src = tempfile.mkdtemp(prefix="stream_state_1000x_")
    results = []
    try:
        prepare_chunks(spark, sf_dir, src, n_chunks)
        for name in wanted:
            out = run_shape(spark, name, os.path.join(src, "*.parquet"))
            summary = {k: v for k, v in out.items() if k != "batches"}
            print(json.dumps(summary), flush=True)
            for b in out["batches"]:
                print(json.dumps({"shape": name, **b}),
                      file=sys.stderr, flush=True)
            results.append(summary)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    here = os.path.dirname(os.path.abspath(__file__))
    out_name = os.environ.get("STREAM_STATE_OUT",
                              "stream_state_r12_1000x.json")
    with open(os.path.join(here, out_name), "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
