"""Scale-toolkit tests: each helper must change the physical plan the way
the 100 TB design requires, verified on the local corpus."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from lstore_spark.catalog import load_table
from lstore_spark import scale


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_matches_plain_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cu = (load_table(spark, sf_dir, "customer")
          .select(F.col("c_custkey").alias("user_id"), "c_mktsegment"))
    plain = ev.join(cu, "user_id").select("event_id", "c_mktsegment")
    salted = scale.salted_join(ev, cu, "user_id").select("event_id", "c_mktsegment")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_deterministic(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cu = (load_table(spark, sf_dir, "customer")
          .select(F.col("c_custkey").alias("user_id"), "c_acctbal"))
    a = scale.salted_join(ev, cu, "user_id").count()
    b = scale.salted_join(ev, cu, "user_id").count()
    assert a == b


def test_partitioned_events_prune(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = tempfile.mkdtemp(prefix="lstore_events_part_")
    scale.write_events_partitioned(ev, out)
    back = scale.read_events_partitioned(spark, out)
    assert back.count() == ev.count()
    pruned = back.filter(F.col("day") == "2024-01-05")
    plan = _plan(pruned)
    # Static partition pruning must reach the scan (segment-drop analog).
    assert "PartitionFilters: [isnotnull(day" in plan, plan[:800]
    expect = ev.filter(F.col("ts").cast("date") == "2024-01-05").count()
    assert pruned.count() == expect


def test_purge_before_drops_old_partitions(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = tempfile.mkdtemp(prefix="lstore_events_purge_")
    scale.write_events_partitioned(ev, out)
    total = ev.count()
    pre_cutoff = ev.filter(F.col("ts").cast("date") < "2024-01-10").count()
    dropped = scale.purge_before(spark, out, "2024-01-10")
    assert dropped == 9  # 2024-01-01 .. 2024-01-09
    back = scale.read_events_partitioned(spark, out)
    assert back.count() == total - pre_cutoff
    assert back.filter(F.col("day") < "2024-01-10").count() == 0


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    scale.write_bucketed_pair(spark, li, od, n_buckets=4)
    j = (spark.table("lineitem_bkt")
         .join(spark.table("orders_bkt"),
               F.col("l_orderkey") == F.col("o_orderkey"))
         .groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")))
    plan = _plan(j)
    before_agg = plan.split("HashAggregate")[-1]  # join subtree sits below agg
    assert "Exchange hashpartitioning" not in before_agg, before_agg[:1200]
    assert j.count() > 0
