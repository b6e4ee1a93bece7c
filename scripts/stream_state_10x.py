"""Stream-stream join state-store growth at the 10× fixture (VERDICT
r6 #7).

The watermarked two-stream join's 100 TB claim is that the time-range
condition + watermark lets the state store EVICT view/purchase rows as
the watermark passes them — state is bounded by the time horizon
(1-hour join window + 2-hour watermark ≈ 3 h of stream), not by stream
length.  r6 proved result-equivalence but never measured state.  This
script drives the join over the 10× events (1M rows spanning 30 days)
in ~20 time-ordered micro-batches and records the state operator's
numRowsTotal / memory per batch from StreamingQuery progress.

Bounded state shows as: per-batch state rows plateau at ~(one
micro-batch's in-horizon rows + the watermark lag), two orders of
magnitude below cumulative input; unbounded (no-eviction) state would
grow to ~45% of 1M (the purchase+view fraction) by the last batch.

Usage: python scripts/stream_state_10x.py [sfbig_dir] [n_chunks]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def prepare_chunks(spark, sf_dir: str, out_dir: str, n_chunks: int) -> None:
    """Split events into n_chunks time-ordered files, written one at a
    time so file mtimes follow event time (the file source's listing
    order) — the arrival order a live stream would have."""
    from lstore_spark.catalog import load_table
    ev = load_table(spark, sf_dir, "events")  # normalizes ns-long ts
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / n_chunks
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_chunks):
        a = lo + span * i
        last = i == n_chunks - 1
        cond = (F.col("ts") >= F.lit(a)) & (
            F.col("ts") <= F.lit(hi) if last
            else F.col("ts") < F.lit(lo + span * (i + 1)))
        tmp = tempfile.mkdtemp(dir=out_dir)
        (ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp))
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.replace(os.path.join(tmp, part),
                   os.path.join(out_dir, f"chunk-{i:03d}.parquet"))
        shutil.rmtree(tmp)


def run_join(spark, src_glob: str) -> dict:
    """Watermarked two-stream purchase⋈view join (the q_stream_stream_join
    streaming form, tests/test_streaming.py), one source file per
    micro-batch; returns per-batch state metrics."""
    src = (spark.readStream.schema(
        spark.read.parquet(src_glob).schema)
        .option("maxFilesPerTrigger", "1").parquet(src_glob))
    # chunks carry real TIMESTAMP ts (prepare_chunks normalized the
    # fixture's ns-long encoding); cast is a no-op safety for µs files
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    p = (src.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
         .withWatermark("p_ts", "2 hours"))
    v = (src.filter(F.col("event_type") == "view")
         .select(F.col("event_id").alias("view_id"),
                 F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
         .withWatermark("v_ts", "2 hours"))
    joined = p.join(v, (F.col("p_user") == F.col("v_user"))
                    & (F.col("v_ts") <= F.col("p_ts"))
                    & (F.col("v_ts") > F.col("p_ts")
                       - F.expr("INTERVAL 1 HOUR")))
    q = (joined.writeStream.format("noop")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    prog = [json.loads(str(p)) for p in q.recentProgress]
    batches = []
    for pr in prog:
        # the very first progress entry can precede state registration —
        # keep its input/output so totals reconcile with the batch twin
        so = (pr.get("stateOperators") or [{}])[0]
        batches.append({
            "batch": pr["batchId"],
            "input_rows": pr.get("numInputRows", 0),
            "state_rows": so.get("numRowsTotal", 0),
            "state_bytes": so.get("memoryUsedBytes", 0),
            "evicted": so.get("numRowsRemoved", 0),
            "output_rows": pr["sink"].get("numOutputRows", -1),
        })
    total_in = sum(b["input_rows"] for b in batches)
    peak = max(b["state_rows"] for b in batches)
    return {
        "total_output_rows": sum(max(b["output_rows"], 0) for b in batches),
        "n_batches": len(batches),
        "total_input_rows": total_in,
        "peak_state_rows": peak,
        "final_state_rows": batches[-1]["state_rows"],
        "total_evicted": sum(b["evicted"] or 0 for b in batches),
        "peak_state_mb": round(max(b["state_bytes"] for b in batches) / 1e6, 1),
        "peak_over_input_pct": round(100.0 * peak / max(total_in, 1), 2),
        "batches": batches,
    }


def main() -> None:
    from lstore_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("stream-state-10x")
    spark.sparkContext.setLogLevel("ERROR")
    src = tempfile.mkdtemp(prefix="stream_state_")
    try:
        prepare_chunks(spark, sf_dir, src, n_chunks)
        out = run_join(spark, os.path.join(src, "*.parquet"))
    finally:
        shutil.rmtree(src, ignore_errors=True)
    summary = {k: v for k, v in out.items() if k != "batches"}
    print(json.dumps(summary), flush=True)
    for b in out["batches"]:
        print(json.dumps(b), file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
