"""Custom stateful streaming operator (applyInPandasWithState): final
per-user state must equal the batch groupBy; plus sampling properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from lstore_spark.catalog import load_table
from lstore_spark.registry import QUERIES


def test_apply_in_pandas_with_state_running_agg(spark, sf_dir):
    out = (
        QUERIES["q_stream_apply_state"](spark, sf_dir)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    batch = (load_table(spark, sf_dir, "events")
             .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events")))
    assert (sorted(map(tuple, out.collect()))
            == sorted(map(tuple, batch.collect())))


def test_runagg_jvm_path_matches_python_state_path(spark, sf_dir):
    """VERDICT r11 #5: the JVM-shape running aggregate (unwindowed
    streaming groupBy.agg, update mode) must produce row-for-row the
    same final per-user totals as the applyInPandasWithState form —
    the documented scale path is a drop-in, not an approximation."""
    jvm = sorted(map(tuple,
                     QUERIES["q_stream_runagg_jvm"](spark, sf_dir).collect()))
    py = sorted(map(tuple,
                    QUERIES["q_stream_apply_state"](spark, sf_dir).collect()))
    assert jvm == py


def test_sample_seeded_bounds_and_stability(spark, sf_dir):
    # the contract is WHICH rows are selected (joinable hash-mod
    # sample), not merely how many — compare row identities (review
    # r11: count equality also passes a per-invocation reseed)
    a = {r.event_id for r in
         QUERIES["q_sample_seeded"](spark, sf_dir).collect()}
    b = {r.event_id for r in
         QUERIES["q_sample_seeded"](spark, sf_dir).collect()}
    assert a == b  # same seed → the same sample, row for row
    total = load_table(spark, sf_dir, "events").count()
    assert 0.05 * total < len(a) < 0.15 * total


def test_event_time_ttl_sessionization_matches_batch(spark, sf_dir):
    """The TTL policy the stateful docstring points at, with the
    strongest checkable semantics: applyInPandasWithState +
    EventTimeTimeout sessionization (30-min gap, state expires when the
    WATERMARK passes last_event + gap) driven over time-ordered
    micro-batches must emit exactly the batch gaps-and-islands sessions
    (q_evt_sessionize) that are provably closed — every emitted session
    is a true batch session, and every batch session whose end + gap
    fell below the final watermark was emitted (timed out or closed by
    a later event).  In-flight tails above the watermark stay in state,
    by design."""
    import os
    import shutil
    import tempfile

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    from lstore_spark.registry import QUERIES
    from scripts.stream_state_10x import prepare_chunks

    GAP_MS = 30 * 60 * 1000

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n_events", LongType()),
    ])
    state_schema = StructType([
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
    ])

    def update(key, pdfs, state):
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            s0, s1, n = state.get
            closed.append((user_id, s0, s1, n))
            state.remove()
        else:
            rows = pd.concat(list(pdfs))
            if len(rows):
                rows = rows.sort_values(["ts", "event_id"])
                ms = (rows["ts"].astype("int64") // 1_000_000).tolist()
                cur = state.get if state.exists else None
                for t in ms:
                    if cur is None:
                        cur = (t, t, 1)
                    elif t - cur[1] <= GAP_MS:
                        cur = (cur[0], t, cur[2] + 1)
                    else:
                        closed.append((user_id, *cur))
                        cur = (t, t, 1)
                state.update(cur)
                state.setTimeoutTimestamp(cur[1] + GAP_MS)
        yield pd.DataFrame(
            closed, columns=["user_id", "start_ms", "end_ms", "n_events"])

    src = tempfile.mkdtemp(prefix="ttl_sess_")
    try:
        prepare_chunks(spark, sf_dir, src, 10)
        stream = (spark.readStream.schema(
            spark.read.parquet(src + "/*.parquet").schema)
            .option("maxFilesPerTrigger", "1").parquet(src + "/*.parquet")
            .select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                    "event_id")
            .withWatermark("ts", "10 minutes"))
        sessions = stream.groupBy("user_id").applyInPandasWithState(
            update, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout)
        q = (sessions.writeStream.format("memory").queryName("ttl_sess")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        import json as _json
        wm = None
        for pr in q.recentProgress:
            d = _json.loads(str(pr))
            w = d.get("eventTime", {}).get("watermark")
            if w and not w.startswith("1970"):
                wm = w
        wm_ms = int(pd.Timestamp(wm).value // 1_000_000)
        # batch session_start/end are formatted to SECONDS — compare at
        # that granularity
        got = {(r.user_id, r.start_ms // 1000, r.end_ms // 1000, r.n_events)
               for r in spark.table("ttl_sess").collect()}
    finally:
        shutil.rmtree(src, ignore_errors=True)

    batch = {
        (r.user_id,
         int(pd.Timestamp(r.session_start).value // 1_000_000_000),
         int(pd.Timestamp(r.session_end).value // 1_000_000_000),
         r.n_events)
        for r in QUERIES["q_evt_sessionize"](spark, sf_dir).collect()}
    assert got, "no sessions emitted"
    assert got <= batch, f"phantom sessions: {list(got - batch)[:3]}"
    must_close = {s for s in batch if s[2] * 1000 + GAP_MS < wm_ms}
    missing = must_close - got
    assert not missing, f"unclosed below watermark: {list(missing)[:3]}"
    # the TTL actually fired for trailing sessions (not only gap-closes)
    assert len(got) >= len(must_close) > 0


def test_udaf_pandas_window_null_safe(spark, tmp_path):
    """r8 review fix: a NULL events.value must not crash the frame UDF
    (Decimal('NaN').quantize raised InvalidOperation) and the mean must
    divide by the NON-NULL count, matching the oracle's COUNT(value)
    OVER w.  Frame [1.0, NULL, 3.0] -> 2.0; an all-NULL frame -> NULL."""
    import datetime

    import pandas as pd

    from lstore_spark.registry import QUERIES

    t0 = datetime.datetime(2024, 1, 1)
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "ts": [t0 + datetime.timedelta(seconds=i) for i in range(4)],
        "user_id": [7, 7, 7, 8],
        "event_type": ["a"] * 4,
        "value": [1.0, None, 3.0, None],
        "props": ["{}"] * 4,
    })
    fx = str(tmp_path / "fx")
    sdf = spark.createDataFrame(ev)
    sdf = sdf.withColumn("ts", sdf.ts.cast("timestamp_ntz"))
    sdf.coalesce(1).write.parquet(fx + "/events.parquet")

    rows = {r.event_id: r.roll_avg for r in
            QUERIES["q_udaf_pandas_window"](spark, fx).collect()}
    assert rows[1] == 1.0
    assert rows[2] == 1.0          # frame [1, NULL] -> 1/1
    assert rows[3] == 2.0          # frame [1, NULL, 3] -> 4/2
    assert rows[4] is None         # user 8: all-NULL frame
