"""§2.1 Scans / sources — the reference's native read surface.

lstore's entire read API is "scan the log forward from an offset,
optionally to the tail" (SURVEY.md §2.1, reconstructed `search.go` /
`segment_head.go`; mount empty, see SURVEY.md §0).  ``events.event_id``
plays the offset role (FIXTURES.md).

Scale notes (100 TB): these compile to a parquet FileScan with pushed
filters (`event_id >= o` prunes row groups via min/max stats — the exact
analog of lstore's per-block int summaries).  The tail read compiles to
TakeOrderedAndProject: per-partition top-N then a single-driver merge of
N*partitions rows — no global sort, no full shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_tables
from ..registry import query

_EV_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@query(
    "q_scan_full",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
)
def q_scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full log scan from offset 0 (lstore: SearchForward(0, no filters))."""
    return load_table(spark, sf_dir, "events").select(*_EV_COLS)


@query(
    "q_scan_from_offset",
    oracle="""
SELECT event_id, ts, user_id, event_type, value
FROM events WHERE event_id >= 5000
""",
)
def q_scan_from_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan from a consumer cursor: offset >= 5000 (pushed to parquet stats)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") >= 5000).select(*_EV_COLS[:5])


@query(
    "q_scan_tail_window",
    oracle="""
SELECT event_id, ts, user_id, event_type, value
FROM events ORDER BY event_id DESC LIMIT 100
""",
)
def q_scan_tail_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail read: latest 100 entries (lstore reads the head/tail segment).

    Compiles to TakeOrderedAndProject — no global sort at scale.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.orderBy(F.col("event_id").desc()).limit(100).select(*_EV_COLS[:5])


@query(
    "q_scan_latest_by_key",
    oracle="""
SELECT user_id,
       arg_max(event_id, event_id) AS last_event_id,
       arg_max(event_type, event_id) AS last_type,
       arg_max(value, event_id) AS last_value,
       COUNT(*) AS n_versions
FROM events GROUP BY user_id
""",
)
def q_scan_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-compacted read: the latest record per key (user_id), treating
    the log as a stream of upserts — the event-store "materialized
    current state" view (log compaction semantics).

    Deliberately an aggregate (``max_by`` keyed on the unique offset),
    NOT a ``row_number()=1`` window: the aggregate partial-combines
    map-side, so each input partition forwards one candidate row per key
    instead of shuffling every version of every key to a sort.  At 100 TB
    with millions of keys this is the difference between shuffling the
    whole log and shuffling ~|keys| rows."""
    ev = load_table(spark, sf_dir, "events")
    # Per-column NULL-arg guard (review r13): DuckDB's arg_max SKIPS
    # rows whose ARG is NULL (verified live on 1.0), while a naive
    # Spark max_by returns the NULL at the true max offset.  Nulling
    # the ORDERING key when the arg is NULL makes max_by skip those
    # rows too — each column independently falls back to the latest
    # non-NULL version, the log-compaction semantics both engines now
    # share (the q_agg_mode r11 latent-guard class).
    def latest(col: str):
        return F.max_by(
            col, F.when(F.col(col).isNotNull(), F.col("event_id")))

    return ev.groupBy("user_id").agg(
        F.max("event_id").alias("last_event_id"),
        latest("event_type").alias("last_type"),
        latest("value").alias("last_value"),
        F.count(F.lit(1)).alias("n_versions"),
    )


_STAR = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


@query(
    "q_source_parquet_star",
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS tbl, COUNT(*) AS n FROM {t}" for t in _STAR
    ),
)
def q_source_parquet_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load every star-schema table with its declared StructType; emit
    (table, row_count) proving each source reads under the fixed schema."""
    dfs = load_tables(spark, sf_dir, _STAR)
    parts = [
        df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(t).alias("tbl"), "n")
        for t, df in dfs.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
