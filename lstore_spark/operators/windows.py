"""§2.5 Window functions.

Determinism discipline: every ORDER BY inside a window frame ends with a
unique key (event_id / o_orderkey) so row_number/lag/first are stable
across engines (FIXTURES.md tie-break note).

Scale: a window partitioned by a key shuffles once on that key and sorts
within partitions — same cost shape as a groupBy.  Windows with *no*
partition key (global ranks) serialize to one task and are only used on
pre-reduced inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..numerics import DEC
from ..registry import query


@query(
    "q_win_rank_topn",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER w AS rn,
         RANK() OVER w AS rk,
         DENSE_RANK() OVER w AS drk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 3
""",
)
def q_win_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the scalable per-group top-k idiom
    (shuffle by custkey, in-partition sort, early filter)."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        od.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_lag_lead",
    oracle="""
SELECT event_id, user_id, value,
       LAG(value)  OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS us_since_last
FROM events
WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event deltas (lstore consumers reconstruct exactly this by
    replaying the log per user; here it's one shuffled window)."""
    # NULL-ts rows are excluded from every ts-ordered window (review
    # r13 contract): Spark orders NULLs FIRST, DuckDB LAST, so an
    # unknown-time row would silently shift the whole partition's
    # lags/frames differently per engine
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (us - F.lag(us).over(w)).alias("us_since_last"),
    )


@query(
    "q_win_running_sum",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS {DEC}))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS VARCHAR) AS DOUBLE) AS run_spend
FROM orders
""",
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer; accumulates in exact decimal so the
    running values are order-independent-identical to DuckDB."""
    od = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return od.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("run_spend"),
    )


@query(
    "q_win_sliding_avg",
    oracle=f"""
SELECT event_id, user_id,
       CAST(CAST(SUM(CAST(value AS {DEC})) OVER w AS VARCHAR) AS DOUBLE)
         / COUNT(value) OVER w AS avg5,
       COUNT(value) OVER w AS n_in_frame
FROM events
WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
)
def q_win_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over the last 5 events per user (rows frame).
    NULL-ts rows excluded — the ts-ordered-window contract (r13)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-4, Window.currentRow))
    return ev.select(
        "event_id", "user_id",
        (F.sum(F.col("value").cast(DEC)).over(w).cast("double")
         / F.count("value").over(w)).alias("avg5"),
        F.count("value").over(w).alias("n_in_frame"),
    )


@query(
    "q_win_range_frame",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       COUNT(*) OVER w AS n_within_10k,
       MIN(o_totalprice) OVER w AS min_within_10k
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
""",
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame (peers by totalprice within 10k) — frame bounds by
    value, so order-key ties don't affect results.

    NOT the naive ``rangeBetween(-10000, currentRow)`` window: that plan
    has two scale diseases measured at 100× (116 s, growth 10.3, headed
    for hours at 1000×) — PARTITION BY o_orderstatus serializes all
    work into |statuses|=3 tasks, and Spark's sliding range frame
    rebuilds the aggregate buffer per row (no retract), O(n·w̄) with
    ~90k-row average frames.  Instead: bucket prices by the frame width
    so every row's frame [p−10k, p] spans EXACTLY two buckets (proof:
    B=floor(p/10k) ⇒ p−10k ∈ [(B−1)·10k, B·10k)); then each frame
    aggregate = a within-bucket prefix + a suffix of the neighbor
    bucket, both computed in ONE value-sorted window over (status,
    bucket) partitions via the probe-merge trick: every row plants a
    tie-ordered probe at p in its own bucket (prefix count/min of
    actual rows ≤ p) and at p−10k in bucket B−1 (suffix count/min of
    actual rows ≥ p−10k, boundary inclusive because the probe's tie
    sorts BEFORE equal-valued actuals), and a final per-key groupBy
    adds the two contributions.  Parallelism is statuses × price-range
    / frame-width (~170 partitions at any SF) instead of 3, and every
    window frame is a cumulative prefix/suffix — O(n) per partition,
    no per-row rebuild.  A cluster deployment would shrink the bucket
    to width/k for k× the parallelism at k+1 probes per row.
    tests/test_plans.py pins this twin row-identical to the native
    rangeBetween form at sf0.01 AND sf0.1."""
    W = 10000.0
    od = (load_table(spark, sf_dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    bkt = F.floor(F.col("o_totalprice") / W).cast("long")
    # Branch A — the current-bucket half needs NO probe rows: count/min
    # of actual rows with v ≤ p (peers included) is a GROWING range
    # frame over the actuals alone, which Spark evaluates with an O(n)
    # incremental accumulator (only the SLIDING frame rebuilds per row).
    w_grow = (Window.partitionBy("st", "bkt").orderBy("v")
              .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    branch_a = (od.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("st"), bkt.alias("bkt"),
        F.col("o_totalprice").alias("v"))
        .select("okey", "st",
                F.col("v").alias("p"),
                F.count(F.lit(1)).over(w_grow).alias("cnt_part"),
                F.min("v").over(w_grow).alias("min_part")))
    # Branch B — the neighbor-bucket suffix (actuals with v ≥ p−10k) via
    # tie-ordered probe rows merged into bucket B−1, evaluated as a
    # cumulative PREFIX over DESCENDING order: Spark evaluates
    # [currentRow, unboundedFollowing] frames by re-aggregating to the
    # partition end per row — O(n²), measured 173 s at 10× before
    # switching direction.  DESC tie 0 > −1 puts equal-valued actuals
    # before the probe, keeping the boundary inclusive.  The first twin
    # shape carried a third probe set and two extra columns through one
    # 3×-wide union and heap-OOMed at 1000× (450M-row window stage);
    # this split keeps the biggest sort at 2× rows of 4 narrow columns.
    nul_l = F.lit(None).cast("bigint")
    actual = od.select(
        F.col("o_orderstatus").alias("st"), bkt.alias("bkt"),
        F.col("o_totalprice").alias("v"), F.lit(0).alias("tie"),
        nul_l.alias("okey"))
    probe_prev = od.select(
        F.col("o_orderstatus").alias("st"), (bkt - 1).alias("bkt"),
        (F.col("o_totalprice") - W).alias("v"), F.lit(-1).alias("tie"),
        F.col("o_orderkey").alias("okey"))
    w_desc = (Window.partitionBy("st", "bkt")
              .orderBy(F.col("v").desc(), F.col("tie").desc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    is_act = (F.col("tie") == 0).cast("long")
    act_v = F.when(F.col("tie") == 0, F.col("v"))
    branch_b = (actual.unionByName(probe_prev)
                .select("okey", "st", "tie",
                        F.sum(is_act).over(w_desc).alias("cnt_part"),
                        F.min(act_v).over(w_desc).alias("min_part"))
                .filter(F.col("tie") == -1)
                .select("okey", "st", F.lit(None).cast("double").alias("p"),
                        "cnt_part", "min_part"))
    return (branch_a.unionByName(branch_b)
            .groupBy("okey")
            .agg(F.first("st").alias("o_orderstatus"),
                 F.max("p").alias("o_totalprice"),
                 F.sum("cnt_part").alias("n_within_10k"),
                 F.min("min_part").alias("min_within_10k"))
            .select(F.col("okey").alias("o_orderkey"), "o_orderstatus",
                    "o_totalprice", "n_within_10k", "min_within_10k"))


@query(
    "q_win_ntile_cume",
    oracle="""
SELECT c_custkey, c_acctbal,
       NTILE(10) OVER w AS decile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
""",
)
def q_win_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global deciles of account balance (unique tie-break on custkey).

    Customer SCALES with SF, so the naive unpartitioned window — one
    task sorting the whole relation — is the scale disease this module's
    header forbids (review r11).  With a UNIQUE total order, all three
    functions are pure arithmetic over the global row number r and the
    count n, so the key routes through ``scale.global_row_number``
    (range exchange + in-partition ranks + broadcast offsets):
    NTILE(k) by the exact first-(n mod k)-buckets-get-one-extra rule,
    PERCENT_RANK = (r−1)/(n−1), CUME_DIST = r/n — bit-identical to the
    window forms because no ties exist."""
    from ..scale import global_row_number

    cu = load_table(spark, sf_dir, "customer")
    ranked = global_row_number(
        cu.select("c_custkey", "c_acctbal"),
        [F.col("c_acctbal").asc(), F.col("c_custkey").asc()], alias="_r")
    n_row = cu.agg(F.count(F.lit(1)).alias("_n"))
    k = 10
    r, n = F.col("_r").cast("long"), F.col("_n").cast("long")

    def idiv(a, b):  # exact integer div (double `/`+trunc can misround)
        return ((a - a % b) / b).cast("long")

    size, rem = idiv(n, F.lit(k)), n % k
    big = rem * (size + 1)  # rows covered by the (size+1)-sized buckets
    decile = (F.when(r <= big, idiv(r - 1, size + 1) + 1)
              .otherwise(rem + idiv(r - big - 1, size) + 1))
    return (ranked.crossJoin(F.broadcast(n_row))
            .select(
                "c_custkey", "c_acctbal",
                decile.cast("int").alias("decile"),
                F.when(n > 1, (r - 1).cast("double") / (n - 1))
                .otherwise(F.lit(0.0)).alias("pct_rank"),
                (r.cast("double") / n).alias("cume")))


@query(
    "q_win_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice)  OVER w AS last_price,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return od.select(
        "o_custkey", "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "q_win_time_range",
    oracle="""
WITH sec AS (
  SELECT event_id, user_id, value,
         date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS t
  FROM events
  WHERE ts IS NOT NULL
)
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_1h,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER w
            AS VARCHAR) AS DOUBLE) AS sum_1h
FROM sec
WINDOW w AS (PARTITION BY user_id ORDER BY t
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
""",
)
def q_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-interval window frame: each event's trailing-one-hour count
    and exact-decimal value sum within its user's stream — the
    rate-limiter / rolling-exposure shape.  Event time maps to integer
    epoch seconds (identical in both engines via the 1970 diff — no
    timezone hop); the frame [t−3599, t] has RANGE-peer semantics, so
    the answer is a function of (user, second) alone.

    NOT the naive ``rangeBetween(-3599, currentRow)`` (review r13):
    Spark's SLIDING range frame rebuilds the aggregate buffer per row
    with no retraction — O(rows × frame-rows), and a hot user emitting
    50k events/hour pays ~50k×50k decimal adds inside one task, the
    q_win_range_frame disease at 100×.  Instead: (1) collapse events
    to per-(user, second) partials — peer semantics make this lossless
    and cap all later work at wall-clock-second granularity; (2) apply
    range_frame's bucket/probe-merge: bucket seconds by the 3600 s
    frame width so every frame spans exactly buckets B−1 and B, take
    the own-bucket half as a GROWING cumulative (O(n) incremental, no
    rebuild) and the neighbor-bucket suffix via a tie-ordered probe at
    t−3599 in a DESC cumulative (probe sorts after equal-second
    actuals — boundary inclusive); (3) add the halves (decimal
    addition — exact, so the hash equals the oracle's single windowed
    SUM) and join back to events on (user, second).  Every window is
    cumulative — no per-row frame rebuild at any density — and
    parallelism is users × active-hours instead of users.  NULL-ts
    rows excluded — the ts-ordered-window contract (r13)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    t = F.expr(
        "timestampdiff(SECOND, to_timestamp_ntz('1970-01-01 00:00:00'), ts)")
    sec = ev.select("event_id", "user_id", "value", t.alias("t"))
    g = (sec.groupBy("user_id", "t")
         .agg(F.count(F.lit(1)).alias("c"),
              F.sum(F.col("value").cast(DEC)).alias("s")))
    W = 3600
    ga = g.select("user_id", "t", "c", "s",
                  F.floor(F.col("t") / W).cast("long").alias("bkt"))
    # own-bucket prefix: seconds ≤ t — growing frame, O(n) incremental
    w_grow = (Window.partitionBy("user_id", "bkt").orderBy("t")
              .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    a = ga.select("user_id", "t",
                  F.sum("c").over(w_grow).alias("cnt_part"),
                  F.sum("s").over(w_grow).alias("sum_part"))
    # neighbor-bucket suffix: seconds ≥ t−3599 via a probe in bucket
    # B−1; DESC tie 0 > −1 puts the equal-second actual BEFORE the
    # probe, keeping the frame's left boundary inclusive
    s_type = dict(zip(ga.schema.names, ga.schema.fields))["s"].dataType
    actual = ga.select("user_id", "bkt", F.col("t").alias("v"),
                       F.lit(0).alias("tie"),
                       F.lit(None).cast("bigint").alias("t_orig"), "c", "s")
    probe = ga.select("user_id", (F.col("bkt") - 1).alias("bkt"),
                      (F.col("t") - (W - 1)).alias("v"),
                      F.lit(-1).alias("tie"), F.col("t").alias("t_orig"),
                      F.lit(0).cast("long").alias("c"),
                      F.lit(None).cast(s_type).alias("s"))
    w_desc = (Window.partitionBy("user_id", "bkt")
              .orderBy(F.col("v").desc(), F.col("tie").desc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    b = (actual.unionByName(probe)
         .select("user_id", "t_orig", "tie",
                 F.sum("c").over(w_desc).alias("cnt_part"),
                 F.sum("s").over(w_desc).alias("sum_part"))
         .filter(F.col("tie") == -1)
         .select("user_id", F.col("t_orig").alias("t"),
                 "cnt_part", "sum_part"))
    per_sec = (a.unionByName(b)
               .groupBy("user_id", "t")
               .agg(F.sum("cnt_part").alias("n_1h"),
                    F.sum("sum_part").cast("double").alias("sum_1h")))
    # null-safe on user_id (review r13): the oracle's PARTITION BY
    # treats NULL user as a real partition, but a plain equi-join back
    # on the nullable key silently dropped those events
    ps = per_sec.select(F.col("user_id").alias("_u"), F.col("t").alias("_t"),
                        "n_1h", "sum_1h")
    return (sec.join(ps, sec.user_id.eqNullSafe(ps._u) & (sec.t == ps._t))
            .select("event_id", "user_id", "n_1h", "sum_1h"))
