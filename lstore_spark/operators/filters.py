"""§2.2 Projection / filter / predicates.

lstore's query surface is exactly "scan from offset + per-column filters":
IntRangeFilter (min/max block skip), IntValueFilter, BlobValueFilter
(pbloom block skip) and conjunctions of them (SURVEY.md §2.2,
reconstructed `search.go`; mount empty).  Each maps to a pushed parquet
predicate here — `.explain` shows them under PushedFilters, which is the
Spark analog of lstore's block skipping, but cluster-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_filter_int_range",
    oracle="""
SELECT event_id, user_id, event_type, value
FROM events WHERE value BETWEEN 100 AND 200
""",
)
def q_filter_int_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range filter (lstore IntRangeFilter → parquet row-group min/max skip)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("value").between(100, 200)).select(
        "event_id", "user_id", "event_type", "value")


@query(
    "q_filter_int_eq",
    oracle="SELECT event_id, ts, value FROM events WHERE user_id = 42",
)
def q_filter_int_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point filter on an int column (lstore IntValueFilter)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("user_id") == 42).select("event_id", "ts", "value")


@query(
    "q_filter_blob_eq",
    oracle="""
SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
""",
)
def q_filter_blob_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/blob equality (lstore BlobValueFilter → pbloom; here parquet
    dictionary/bloom pushdown)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value")


@query(
    "q_filter_conjunction",
    oracle="""
SELECT event_id, user_id, event_type, value FROM events
WHERE event_type = 'view' AND value > 250 AND user_id < 100
""",
)
def q_filter_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND of int+blob filters, as lstore combines filters per search."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "view")
        .filter(F.col("value") > 250)
        .filter(F.col("user_id") < 100)
        .select("event_id", "user_id", "event_type", "value")
    )


@query(
    "q_filter_disjunction_in",
    oracle="""
SELECT event_id, user_id, event_type, value FROM events
WHERE event_type IN ('signup', 'error') OR value < 5
""",
)
def q_filter_disjunction_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("event_type").isin("signup", "error") | (F.col("value") < 5)
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "q_filter_null_handling",
    oracle="""
SELECT event_id,
       NULLIF(event_type, 'click') AS et_nullable,
       NULLIF(event_type, 'click') IS NULL AS is_click,
       COALESCE(NULLIF(event_type, 'click'), 'was-click') AS et_filled
FROM events
WHERE NULLIF(event_type, 'click') IS NULL OR user_id < 50
""",
)
def q_filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL / COALESCE over a synthesized nullable column
    (the corpus has no physical nulls — FIXTURES.md)."""
    ev = load_table(spark, sf_dir, "events")
    et_n = F.nullif(F.col("event_type"), F.lit("click"))
    return (
        ev.select(
            "event_id",
            et_n.alias("et_nullable"),
            et_n.isNull().alias("is_click"),
            F.coalesce(et_n, F.lit("was-click")).alias("et_filled"),
            "user_id",
        )
        .filter(F.col("et_nullable").isNull() | (F.col("user_id") < 50))
        .drop("user_id")
    )


@query(
    "q_project_prune",
    oracle="""
SELECT event_id,
       value,
       value * 1.1 AS value_taxed,
       year(ts) AS yr
FROM events
""",
)
def q_project_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow projection + computed column: ReadSchema must show only
    (event_id, value, ts) — column pruning the row-store reference can't do."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "value",
        (F.col("value") * 1.1).alias("value_taxed"),
        F.year("ts").alias("yr"),
    )


@query(
    "q_filter_like_regex",
    oracle="""
SELECT p_partkey, p_name, p_brand FROM part
WHERE p_name LIKE '%ivory%' OR regexp_matches(p_brand, '^Brand#(1|22)$')
""",
)
def q_filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%ivory%") | F.col("p_brand").rlike("^Brand#(1|22)$")
    ).select("p_partkey", "p_name", "p_brand")
