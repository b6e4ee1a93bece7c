"""§2.7 Set operations over event slices (multiset semantics included —
the order-insensitive hash still sees duplicate multiplicity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def _slice(spark, sf_dir, et):
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == et).select("user_id", "event_type", "value")


@query(
    "q_set_union_all",
    oracle="""
SELECT user_id, event_type, value FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT user_id, event_type, value FROM events WHERE event_type = 'signup'
""",
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _slice(spark, sf_dir, "purchase").unionByName(
        _slice(spark, sf_dir, "signup"))


@query(
    "q_set_union_distinct",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
UNION
SELECT user_id FROM events WHERE value > 400
""",
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("value") > 400).select("user_id")
    return a.union(b).distinct()


@query(
    "q_set_intersect",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'view'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@query(
    "q_set_except",
    oracle="""
SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase'
""",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, day) pairs with a view but no purchase (≡ anti join on the
    distinct sets; Spark plans EXCEPT exactly that way).  Keyed by day
    because every fixture user has every event type overall."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date").alias("day")
    a = ev.filter(F.col("event_type") == "view").select("user_id", day)
    b = ev.filter(F.col("event_type") == "purchase").select("user_id", day)
    return a.subtract(b)  # subtract == EXCEPT DISTINCT


@query(
    "q_set_intersect_all",
    oracle="""
SELECT user_id, value FROM events WHERE event_type = 'view'
INTERSECT ALL
SELECT user_id, value FROM events WHERE value < 250
""",
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL: keeps min(multiplicity) copies of each row
    (Spark plans it as a count-compare aggregate, no row explosion)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id", "value")
    b = ev.filter(F.col("value") < 250).select("user_id", "value")
    return a.intersectAll(b)


@query(
    "q_set_except_all",
    oracle="""
SELECT user_id, event_type FROM events WHERE value < 500
EXCEPT ALL
SELECT user_id, event_type FROM events WHERE event_type = 'purchase'
""",
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL: subtracts per-row multiplicity (left count
    minus right count), unlike q_set_except's distinct-set semantics."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("value") < 500).select("user_id", "event_type")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_type")
    return a.exceptAll(b)


@query(
    "q_distinct",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()
