"""§2.6 Sorts / limits / top-k.

The correctness hash is order-insensitive, so sort order is made
*observable* by materializing a global row_number over the sort order —
the sorted position becomes part of the values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_sort_multi_key",
    oracle="""
SELECT s_suppkey, s_nationkey, s_acctbal, nullable_nat,
       ROW_NUMBER() OVER (ORDER BY nullable_nat ASC NULLS LAST,
                          s_acctbal DESC, s_suppkey ASC) AS pos
FROM (
  SELECT s_suppkey, s_nationkey, s_acctbal,
         NULLIF(s_nationkey, 0) AS nullable_nat
  FROM supplier
)
""",
)
def q_sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with explicit nulls placement, witnessed by a
    global position column.  The position comes from
    ``scale.global_row_number`` — range exchange + in-partition ranks +
    broadcast offsets — because supplier SCALES with SF and the naive
    global window serialized the whole relation into one task (review
    r11); the unique s_suppkey tie-break makes the distributed rank
    exactly the oracle's ROW_NUMBER."""
    from ..scale import global_row_number

    su = load_table(spark, sf_dir, "supplier").withColumn(
        "nullable_nat", F.nullif(F.col("s_nationkey"), F.lit(0)))
    order = [F.col("nullable_nat").asc_nulls_last(),
             F.col("s_acctbal").desc(), F.col("s_suppkey").asc()]
    return global_row_number(
        su.select("s_suppkey", "s_nationkey", "s_acctbal", "nullable_nat"),
        order, alias="pos")


@query(
    "q_topk_limit",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 50
""",
)
def q_topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: compiles to TakeOrderedAndProject (per-partition heap
    of k, driver merges k×partitions) — no global sort at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(50)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "q_limit_offset",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 20 OFFSET 100
""",
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination: offset+limit over a unique sort key."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.orderBy("o_orderkey")
        .offset(100)
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
