"""Interleaved A/B (VERDICT r13 #6): q_agg_groupby_hash's 8 exact-
decimal aggregates vs long-scaled integer accumulation — the _query_lut
exactness pattern applied to TPC-H Q1.

Forms:
  decimal : the shipped key (sum/avg over CAST(x AS DECIMAL(30,8))).
  long    : per-row v = CAST(ROUND(x*1e8, 0) AS LONG) (the unscaled
            decimal — exact for these <=6-true-decimal inputs), SUM(v)
            as one long, final value reconstructed through exact
            decimal division.  Overflows int64 past ~1e18/1e8 sum —
            fixture-bounded, the speed ceiling probe.
  split   : same v, accumulated as SUM(v div 1e6) and SUM(v % 1e6) —
            headroom to ~6e11 rows (100 TB lineitem) per group under
            ANSI loud-overflow; the shippable scale-safe variant.

Parity asserted: exceptAll both ways vs the shipped key for both
candidates before timing.

Usage: python scripts/ab_groupby_hash_r14.py [-n REPS]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lstore_spark.catalog import load_table  # noqa: E402
from lstore_spark.registry import QUERIES, load_all  # noqa: E402
from lstore_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_SC = 100_000_000  # 1e8: the DECIMAL(30,8) unscale factor


def _v(col):
    """Unscaled-long image of CAST(col AS DECIMAL(30,8)): exact for
    inputs with <=6 true decimal digits (error << half at 1e-8)."""
    return F.round(col * F.lit(float(_SC)), 0).cast("long")


def _redec(sum_col):
    """Exact decimal from an unscaled-long sum, cast to double the same
    correctly-rounded way the decimal form's final cast is."""
    return (sum_col.cast("decimal(38,0)") / F.lit(_SC)).cast("double")


def _filtered_li(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00")
        .cast("timestamp_ntz"))


def long_form(spark, sf_dir):
    li = _filtered_li(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cols = {"q": _v(F.col("l_quantity")), "p": _v(F.col("l_extendedprice")),
            "d": _v(disc_price), "c": _v(charge),
            "ds": _v(F.col("l_discount"))}
    pre = li.select("l_returnflag", "l_linestatus",
                    *[v.alias(k) for k, v in cols.items()],
                    F.col("l_quantity").isNotNull().alias("nq"),
                    F.col("l_extendedprice").isNotNull().alias("np"),
                    F.col("l_discount").isNotNull().alias("nd"))
    g = pre.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("q").alias("sq"), F.sum("p").alias("sp"),
        F.sum("d").alias("sd"), F.sum("c").alias("sc"),
        F.sum("ds").alias("sds"),
        F.sum(F.col("nq").cast("long")).alias("cq"),
        F.sum(F.col("np").cast("long")).alias("cp"),
        F.sum(F.col("nd").cast("long")).alias("cd"),
        F.count(F.lit(1)).alias("count_order"))
    return g.select(
        "l_returnflag", "l_linestatus",
        _redec(F.col("sq")).alias("sum_qty"),
        _redec(F.col("sp")).alias("sum_base_price"),
        _redec(F.col("sd")).alias("sum_disc_price"),
        _redec(F.col("sc")).alias("sum_charge"),
        (_redec(F.col("sq")) / F.col("cq")).alias("avg_qty"),
        (_redec(F.col("sp")) / F.col("cp")).alias("avg_price"),
        (_redec(F.col("sds")) / F.col("cd")).alias("avg_disc"),
        "count_order")


def split_form(spark, sf_dir):
    li = _filtered_li(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cols = {"q": _v(F.col("l_quantity")), "p": _v(F.col("l_extendedprice")),
            "d": _v(disc_price), "c": _v(charge),
            "ds": _v(F.col("l_discount"))}
    M = 1_000_000
    pre = li.select(
        "l_returnflag", "l_linestatus",
        *[x for k, v in cols.items()
          for x in ((v / M).cast("long").alias(f"{k}_h"),
                    (v % M).alias(f"{k}_l"))],
        F.col("l_quantity").isNotNull().alias("nq"),
        F.col("l_extendedprice").isNotNull().alias("np"),
        F.col("l_discount").isNotNull().alias("nd"))
    aggs = []
    for k in cols:
        aggs += [F.sum(f"{k}_h").alias(f"s{k}h"),
                 F.sum(f"{k}_l").alias(f"s{k}l")]
    g = pre.groupBy("l_returnflag", "l_linestatus").agg(
        *aggs,
        F.sum(F.col("nq").cast("long")).alias("cq"),
        F.sum(F.col("np").cast("long")).alias("cp"),
        F.sum(F.col("nd").cast("long")).alias("cd"),
        F.count(F.lit(1)).alias("count_order"))

    def rede(k):
        return ((F.col(f"s{k}h").cast("decimal(38,0)") * M
                 + F.col(f"s{k}l")) / F.lit(_SC)).cast("double")

    return g.select(
        "l_returnflag", "l_linestatus",
        rede("q").alias("sum_qty"), rede("p").alias("sum_base_price"),
        rede("d").alias("sum_disc_price"), rede("c").alias("sum_charge"),
        (rede("q") / F.col("cq")).alias("avg_qty"),
        (rede("p") / F.col("cp")).alias("avg_price"),
        (rede("ds") / F.col("cd")).alias("avg_disc"),
        "count_order")


def main() -> None:
    n = 7
    if len(sys.argv) > 2 and sys.argv[1] == "-n":
        n = int(sys.argv[2])
    load_all()
    spark = get_spark("ab-groupby-hash-r14")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32).repartition(32).count()

    dec = QUERIES["q_agg_groupby_hash"](spark, SF_DIR)
    forms = {"long": long_form(spark, SF_DIR),
             "split": split_form(spark, SF_DIR)}
    for label, df in forms.items():
        d1 = dec.exceptAll(df).count()
        d2 = df.exceptAll(dec).count()
        print(f"# parity {label}: dec\\x={d1} x\\dec={d2}", file=sys.stderr)
        assert d1 == 0 and d2 == 0, f"{label} diverges from decimal"

    arms = [("decimal", lambda: QUERIES["q_agg_groupby_hash"](
        spark, SF_DIR)),
        ("long", lambda: long_form(spark, SF_DIR)),
        ("split", lambda: split_form(spark, SF_DIR))]
    times = {k: [] for k, _ in arms}
    for i in range(n):
        for label, fn in arms:
            spark.sparkContext.setJobDescription(f"ab:{label}:{i}")
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            times[label].append(round(time.perf_counter() - t0, 3))
    out = {k: {"times": v, "median": round(statistics.median(v), 3),
               "min": min(v)} for k, v in times.items()}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
