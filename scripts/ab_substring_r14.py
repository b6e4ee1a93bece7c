"""Interleaved A/B: q_llm_dedup_substring — the r13 two-exchange
distinct-aggregate (groupBy(span).agg(count_distinct(doc_id), count))
vs the r14 shipped single-exchange form (per-doc span runs via
_span_runs, then count/sum on one span-keyed shuffle).  Noop sink,
shared session, interleaved reps; exceptAll parity asserted both ways.

Usage: python scripts/ab_substring_r14.py [-n REPS]
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
from lstore_spark.llm.dedup import _SUBSTR_W, _span_windows  # noqa: E402
from lstore_spark.llm.text import _SPARK_TOKENS  # noqa: E402
from lstore_spark.registry import QUERIES, load_all  # noqa: E402
from lstore_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def r13_form(spark, sf_dir, w: int = _SUBSTR_W):
    """The pre-r14 raw-keyed shape, verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    occ = (docs.select("doc_id", F.expr(_SPARK_TOKENS).alias("ts"))
           .select("doc_id", F.explode(_span_windows(w)).alias("span")))
    return (occ.groupBy("span")
            .agg(F.count_distinct("doc_id").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occ"))
            .filter(F.col("n_docs") > 1))


def main() -> None:
    n = 7
    if len(sys.argv) > 2 and sys.argv[1] == "-n":
        n = int(sys.argv[2])
    load_all()
    spark = get_spark("ab-substring-r14")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32).repartition(32).count()  # codegen warm-up

    old = r13_form(spark, SF_DIR)
    new = QUERIES["q_llm_dedup_substring"](spark, SF_DIR)
    d1 = old.exceptAll(new).count()
    d2 = new.exceptAll(old).count()
    print(f"# parity: old\\new={d1} new\\old={d2}", file=sys.stderr)
    assert d1 == 0 and d2 == 0, "forms disagree"

    times = {"r13_two_exchange": [], "r14_span_runs": []}
    for i in range(n):
        for label, fn in (("r13_two_exchange",
                           lambda: r13_form(spark, SF_DIR)),
                          ("r14_span_runs",
                           lambda: QUERIES["q_llm_dedup_substring"](
                               spark, SF_DIR))):
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
