"""Batch mutation / incremental-maintenance operators: MERGE-style
upsert, SCD2 dimension versioning, and mergeable partial-aggregate
rollups (the "continuous aggregate" pattern).

The reference store is append-only with compaction (SURVEY.md §1.1);
on Spark the analogous user-facing surface is MERGE semantics over an
immutable snapshot — computed as a full-outer join against the change
batch — plus re-aggregable partials so a 100 TB rollup never rescans
raw history.  Change batches here are derived *deterministically from
the fixture tables themselves* so the DuckDB oracle can reproduce them
with plain SQL (no side-channel files).

Scale notes: the upsert join shuffles on the primary key exactly once
(or broadcasts when the change batch is small — the common case); SCD2
versioning is one window over the key; rollup merge re-aggregates
minute partials into hours without touching raw rows, keeping the sums
in exact DECIMAL until the final cast (numerics.py discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fits_broadcast, load_table
from ..numerics import DEC, sql_dec2dbl
from ..registry import pin, query

# ------------------------------------------------------------------ MERGE


@query(
    "q_merge_upsert",
    oracle="""
WITH changes AS (
  SELECT o_orderkey, o_totalprice + 10.0 AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, 'N'
  FROM orders WHERE o_orderkey % 13 = 0
)
SELECT COALESCE(c.o_orderkey, t.o_orderkey) AS o_orderkey,
       COALESCE(c.o_totalprice, t.o_totalprice) AS o_totalprice,
       COALESCE(c.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
       CASE WHEN t.o_orderkey IS NULL THEN 'inserted'
            WHEN c.o_orderkey IS NULL THEN 'kept'
            ELSE 'updated' END AS merge_action
FROM orders t FULL OUTER JOIN changes c ON t.o_orderkey = c.o_orderkey
""",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (upsert / SCD1) as a full-outer join: matched
    rows take the change batch's values, unmatched-by-target rows insert,
    unmatched-by-source rows pass through.  The change batch is derived
    from orders itself (keys ≡ 0 mod 7 update price by +10; keys ≡ 0 mod
    13 insert under key+1e8) so both engines build the identical batch.

    Scale: one equi shuffle on the primary key — and in the common case
    (change batch ≪ target) Catalyst broadcasts the batch, making MERGE
    a map-side operation over the 100 TB target scan."""
    od = load_table(spark, sf_dir, "orders")
    updates = (od.filter(F.col("o_orderkey") % 7 == 0)
               .select("o_orderkey",
                       (F.col("o_totalprice") + 10.0).alias("o_totalprice"),
                       "o_orderstatus"))
    inserts = (od.filter(F.col("o_orderkey") % 13 == 0)
               .select((F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                       "o_totalprice",
                       F.lit("N").alias("o_orderstatus")))
    changes = updates.unionByName(inserts)
    t = od.select(F.col("o_orderkey").alias("t_key"),
                  F.col("o_totalprice").alias("t_price"),
                  F.col("o_orderstatus").alias("t_status"))
    c = changes.select(F.col("o_orderkey").alias("c_key"),
                       F.col("o_totalprice").alias("c_price"),
                       F.col("o_orderstatus").alias("c_status"))
    merged = t.join(c, t.t_key == c.c_key, "full_outer")
    action = (
        F.when(F.col("t_key").isNull(), F.lit("inserted"))
        .when(F.col("c_key").isNull(), F.lit("kept"))
        .otherwise(F.lit("updated"))
    )
    return merged.select(
        F.coalesce("c_key", "t_key").alias("o_orderkey"),
        F.coalesce("c_price", "t_price").alias("o_totalprice"),
        F.coalesce("c_status", "t_status").alias("o_orderstatus"),
        action.alias("merge_action"),
    )


@query(
    "q_merge_scd2",
    oracle="""
WITH v1 AS (
  SELECT c_custkey, c_mktsegment, 1 AS version FROM customer
),
v2 AS (
  SELECT c_custkey, 'MACHINERY-V2' AS c_mktsegment, 2 AS version
  FROM customer WHERE c_custkey % 5 = 0
),
hist AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT c_custkey, version, c_mktsegment,
       (LEAD(version) OVER w IS NULL) AS is_current,
       COALESCE(LEAD(version) OVER w, 0) AS superseded_by
FROM hist
WINDOW w AS (PARTITION BY c_custkey ORDER BY version)
""",
)
def q_merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: apply a change batch (every 5th
    customer moves to segment 'MACHINERY-V2') as a NEW version row, then
    close out prior versions with a per-key LEAD — full history retained,
    `is_current` marks the live row.

    Scale: one window over c_custkey (high cardinality → even tasks);
    version chains are short (dimension churn), so no skew.  The same
    plan maintains an SCD2 dimension incrementally: union the day's
    batch, re-window only affected keys."""
    cu = load_table(spark, sf_dir, "customer")
    v1 = cu.select("c_custkey", "c_mktsegment", F.lit(1).alias("version"))
    v2 = (cu.filter(F.col("c_custkey") % 5 == 0)
          .select("c_custkey", F.lit("MACHINERY-V2").alias("c_mktsegment"),
                  F.lit(2).alias("version")))
    hist = v1.unionByName(v2)
    w = Window.partitionBy("c_custkey").orderBy("version")
    nxt = F.lead("version").over(w)
    return hist.select(
        "c_custkey", "version", "c_mktsegment",
        nxt.isNull().alias("is_current"),
        F.coalesce(nxt, F.lit(0)).alias("superseded_by"),
    )


# ------------------------------------------------- mergeable rollup


@query(
    "q_ts_rollup_merge",
    oracle=f"""
WITH minutely AS (
  SELECT date_trunc('minute', ts) AS m,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(30,8))) AS sum_dec
  FROM events GROUP BY 1
)
SELECT date_trunc('hour', m) AS bucket_hour,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       {sql_dec2dbl('SUM(sum_dec)')} AS sum_value
FROM minutely GROUP BY 1
""",
)
def q_ts_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup via mergeable partials (the hypertable /
    continuous-aggregate pattern): aggregate events to minute grain,
    then re-aggregate the PARTIALS to hour grain — raw rows are read
    exactly once, and the hourly layer is maintainable from the minutely
    layer alone.  Sums stay in exact DECIMAL across both levels (double
    re-summation of partials would be order-dependent); the final cast
    to double is the only rounding.

    Scale: at 100 TB the minutely layer is ~10^6× smaller than raw
    events, so the hourly (and daily, …) rollups are near-free; both
    aggregations are partial-combined hash aggs."""
    ev = load_table(spark, sf_dir, "events")
    minutely = (
        ev.groupBy(F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast(DEC)).alias("sum_dec"))
    )
    return (
        minutely.groupBy(F.date_trunc("hour", "m").alias("bucket_hour"))
        .agg(F.sum("n_events").alias("n_events"),
             F.sum("sum_dec").cast("double").alias("sum_value"))
    )


# ------------------------------------------------- CDC extraction


@query(
    "q_cdc_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 89 <> 0
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 5.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 97 <> 0
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS change_op,
       o.o_totalprice AS old_price,
       n.o_totalprice AS new_price
FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_totalprice <> n.o_totalprice
   OR o.o_orderstatus <> n.o_orderstatus
""",
)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC *extraction* — the inverse of q_merge_upsert's CDC *apply*:
    given two immutable snapshots of a keyed table, emit the minimal
    change stream (insert / update / delete per key) that transforms one
    into the other.  This is how an append-only store derives a change
    feed from periodic snapshots when no transaction log exists.  The
    two snapshot versions are derived deterministically from orders
    itself (keys ≡ 0 mod 89 absent from the old snapshot = inserts;
    keys ≡ 0 mod 97 absent from the new = deletes; open orders get a
    +5.0 price bump = updates) so the DuckDB oracle reproduces them
    exactly; unchanged keys are filtered out of the feed.

    Scale: ONE full-outer sort-merge join on the primary key — both
    snapshot scans project only (key, compared columns), so 100 TB
    snapshots diff at the cost of shuffling their pruned projections.
    Snapshots bucketed by PK (q_source_bucketed_join) make the diff
    exchange-free; AQE handles the skewless high-cardinality key well."""
    od = load_table(spark, sf_dir, "orders")
    old = (od.filter(F.col("o_orderkey") % 89 != 0)
           .select("o_orderkey", "o_totalprice", "o_orderstatus"))
    new = (od.filter(F.col("o_orderkey") % 97 != 0)
           .select("o_orderkey",
                   F.when(F.col("o_orderstatus") == "O",
                          F.col("o_totalprice") + 5.0)
                   .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
                   "o_orderstatus"))
    o, n = old.alias("o"), new.alias("n")
    j = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    return (
        j.filter(F.col("o.o_orderkey").isNull()
                 | F.col("n.o_orderkey").isNull()
                 | (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
                 | (F.col("o.o_orderstatus") != F.col("n.o_orderstatus")))
        .select(
            F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey"))
            .alias("o_orderkey"),
            F.when(F.col("o.o_orderkey").isNull(), "insert")
            .when(F.col("n.o_orderkey").isNull(), "delete")
            .otherwise("update").alias("change_op"),
            F.col("o.o_totalprice").alias("old_price"),
            F.col("n.o_totalprice").alias("new_price"))
    )


@query(
    "q_mv_incremental_refresh",
    oracle=f"""
SELECT c_nationkey,
       COUNT(*) AS n_orders,
       {sql_dec2dbl("SUM(CAST(o_totalprice AS DECIMAL(30,8)))")}
         AS total_price,
       ROUND({sql_dec2dbl("SUM(CAST(o_totalprice AS DECIMAL(30,8)))")}
             / COUNT(*), 6) AS avg_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
""",
)
def q_mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a per-nation revenue
    rollup kept fresh by MERGING a delta batch's partial aggregate into
    the stored base aggregate — never re-scanning the base fact table.
    The oracle is the semantic contract: incremental refresh must equal
    the full recompute exactly.

    The split (orders before/after 2000-01-01) plays base vs delta; each
    side reduces to mergeable partials (COUNT and EXACT-decimal SUM —
    associative/commutative, so base ⊎ delta re-aggregates losslessly;
    derived columns like avg are recomputed FROM the merged partials,
    never merged themselves — averaging averages is the classic MV bug).
    At 100 TB the base partial is |nations| rows persisted between runs;
    each refresh shuffles only the delta.  Dims broadcast on both legs."""
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    split = F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    # Pin enr: it feeds the base and delta branches; in the real
    # pipeline these are separate runs, but within this one-query demo
    # Spark would otherwise scan+join orders twice.  Serialized persist
    # (not localCheckpoint): spillable at any scale.  Customer
    # broadcast is stats-gated like the TPC-H family (review r10: this
    # was an ungated full-dim broadcast — the shape the 1000× probe
    # measured 2× over linear before q5's gate).
    cu_fit = fits_broadcast(sf_dir, "customer")
    enr = pin(od.join(F.broadcast(cu) if cu_fit else cu,
                      od.o_custkey == cu.c_custkey)
              .select("c_nationkey", "o_totalprice", "o_orderdate"))

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("_s"))

    base = partial(enr.filter(F.col("o_orderdate") < split))
    delta = partial(enr.filter(F.col("o_orderdate") >= split))
    merged = (base.unionByName(delta)
              .groupBy("c_nationkey")
              .agg(F.sum("_n").alias("_n"), F.sum("_s").alias("_s")))
    return merged.select(
        "c_nationkey",
        F.col("_n").alias("n_orders"),
        F.col("_s").cast("double").alias("total_price"),
        F.round(F.col("_s").cast("double") / F.col("_n"), 6)
         .alias("avg_price"),
    )
