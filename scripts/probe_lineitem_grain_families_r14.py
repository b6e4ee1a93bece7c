"""VERDICT r13 #4: decide the supplier-/part-grain lineitem routing
question with numbers at 1000x.

q_tpch_q15_top_supplier groups lineitem by l_suppkey and
q_tpch_q17_small_qty by l_partkey; routing either onto a bucketed
layout needs a THIRD/FOURTH full bucketed copy of lineitem.  This
probe builds each candidate family once (recording build wall + bytes
— the same cost discipline the scale ledger applies to the shipped
families), then interleaved-A/Bs the exact aggregate stage each key
would route:

  q15: lineitem filtered to the 1996Q1 window, groupBy(l_suppkey),
       SUM(decimal revenue)  — plain scan vs bucketed-by-suppkey scan.
  q17: lineitem brand-semi-filtered (the shipped r9 shape), groupBy
       (l_partkey) threshold aggregate — plain vs bucketed-by-partkey.

Ship bar: the routed arm must beat plain by enough to amortize an
extra ~580 s / ~11.5 GB one-time rewrite per family (the order-family
ledger numbers).  Emits one JSON line.

Phases run SEQUENTIALLY with cleanup between (each bucketed copy is
~11.5 GB and the build shuffle needs comparable temp space — both
at once exhausted the sandbox disk on the first attempt):

Usage: python scripts/probe_lineitem_grain_families_r14.py <supp|part> [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F  # noqa: E402

from lstore_spark.catalog import load_table  # noqa: E402
from lstore_spark.numerics import DEC  # noqa: E402
from lstore_spark.session import get_spark  # noqa: E402

FX = os.environ.get("SF1000X_DIR", "/tmp/sf1000x")
N_BUCKETS = 240  # match the order family at this fixture


def dir_bytes(path: str) -> int:
    total = 0
    for root, _d, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def build_family(spark, key: str, tag: str) -> tuple[str, float, int]:
    """One-off bucketed+sorted lineitem copy on ``key`` (probe scratch,
    NOT a published catalog family)."""
    loc = f"/tmp/lstore_probe_{tag}"
    tbl = f"lstore_probe_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(loc, ignore_errors=True)
    t0 = time.perf_counter()
    (load_table(spark, FX, "lineitem")
     .repartition(N_BUCKETS, key)
     .write.bucketBy(N_BUCKETS, key).sortBy(key)
     .option("path", loc).format("parquet").saveAsTable(tbl))
    return tbl, round(time.perf_counter() - t0, 1), dir_bytes(loc)


def q15_agg(li):
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    return (li.filter((F.col("l_shipdate") >= lo)
                      & (F.col("l_shipdate") < hi))
            .groupBy("l_suppkey").agg(F.sum(rev).alias("_total")))


def q17_threshold(li, pa):
    li_b = li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey,
                   "left_semi")
    return (li_b.groupBy(F.col("l_partkey").alias("t_partkey"))
            .agg((0.5 * (F.sum(F.col("l_quantity").cast(DEC))
                         .cast("double") / F.count(F.lit(1))))
                 .alias("qty_cut")))


def timed(spark, label, fn, reps, out):
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"grain:{label}:{i}")
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        out.setdefault(label, []).append(
            round(time.perf_counter() - t0, 2))


def main() -> None:
    phase = sys.argv[1]
    assert phase in ("supp", "part"), "phase must be supp|part"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("grain-families-r14")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32).repartition(32).count()

    li_plain = load_table(spark, FX, "lineitem")
    pa = load_table(spark, FX, "part").filter(F.col("p_brand") == "Brand#1")
    # clear BOTH probe scratches first (an earlier crashed phase may
    # have left an 11.5 GB copy behind)
    for tag in ("bktsupp", "bktpart"):
        spark.sql(f"DROP TABLE IF EXISTS lstore_probe_{tag}")
        shutil.rmtree(f"/tmp/lstore_probe_{tag}", ignore_errors=True)

    out: dict = {"fixture": FX, "n_buckets": N_BUCKETS, "phase": phase}
    key, tag = (("l_suppkey", "bktsupp") if phase == "supp"
                else ("l_partkey", "bktpart"))
    tbl, bsec, bbytes = build_family(spark, key, tag)
    out["family_build"] = {"key": key, "sec": bsec, "bytes": bbytes}
    print(f"# build: {key} {bsec}s/{bbytes}B", file=sys.stderr)

    if phase == "supp":
        plain = lambda: q15_agg(li_plain)            # noqa: E731
        routed = lambda: q15_agg(spark.table(tbl))   # noqa: E731
        labels = ("q15_plain", "q15_bucketed")
    else:
        plain = lambda: q17_threshold(li_plain, pa)          # noqa: E731
        routed = lambda: q17_threshold(spark.table(tbl), pa)  # noqa: E731
        labels = ("q17_plain", "q17_bucketed")
    a, b = plain(), routed()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    print("# parity ok", file=sys.stderr)
    times: dict = {}
    for i in range(reps):
        timed(spark, labels[0], plain, 1, times)
        timed(spark, labels[1], routed, 1, times)
    out["times"] = {k: {"runs_sec": v,
                        "median": round(statistics.median(v), 2),
                        "min": min(v)} for k, v in times.items()}
    import re

    def nexch(df):
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        return len(re.findall(r"\(\d+\) Exchange\b", txt))

    out["plan_exchanges"] = {labels[0]: nexch(plain()),
                             labels[1]: nexch(routed())}
    print(json.dumps(out), flush=True)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(f"/tmp/lstore_probe_{tag}", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
