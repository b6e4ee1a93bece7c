"""Dev loop: run every registered query against the DuckDB oracle at
sf0.01 in one Spark session; print a pass/fail table.

Usage: python scripts/check.py [key-substring ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lstore_spark.registry import ORACLE, QUERIES  # noqa: E402
from lstore_spark.session import get_spark  # noqa: E402
from tests.oracle_check import compare, duck_connect  # noqa: E402

SF_DIR = os.environ.get("LSTORE_SPARK_TEST_SF", "/root/testdata/sf0.01")

# Keys whose OUTPUT (not plan) is quadratic in input size: at the ~sf1
# sweep the theta join alone emits 21M pairs — far past what the
# collect-and-canonicalize comparator can hash in Python.  The query
# itself stays a banded equi-join (fine at scale); only the *comparison*
# is bounded, by pushing the same deterministic modulus slice of pairs
# into both engines (still ~200k exactly-compared rows at ~sf1).
PAIR_SAMPLE: dict[str, tuple[str, int]] = {
    "q_join_theta_range": ("id_a", 97),
}


def _maybe_sample(key: str, df, sql: str):
    if key in PAIR_SAMPLE and os.environ.get("LSTORE_SPARK_BIG"):
        col, m = PAIR_SAMPLE[key]
        df = df.filter(F.col(col) % m == 0)
        sql = f"SELECT * FROM ({sql}) WHERE {col} % {m} = 0"
    return df, sql


def main() -> int:
    filters = sys.argv[1:]
    keys = sorted(
        k for k in QUERIES
        if not filters or any(f in k for f in filters)
    )
    spark = get_spark("lstore-spark-check", cpus="8", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(SF_DIR)
    n_ok = n_fail = 0
    failures: list[str] = []
    for key in keys:
        t0 = time.time()
        try:
            df = QUERIES[key](spark, SF_DIR)
            if key in ORACLE:
                df2, sql2 = _maybe_sample(key, df, ORACLE[key])
                res = compare(key, df2, con, sql2)
                status = "OK " if res.ok else "FAIL"
                extra = res.detail
                if res.ok and res.spark_rows == 0:
                    status, extra = "FAIL", "empty result"
                if not res.ok and res.mismatches:
                    extra += " | ex: spark=%s duck=%s" % res.mismatches[0]
            else:
                n = df.count()
                status = "OK " if n > 0 else "FAIL"
                extra = f"rows-only n={n}"
                res = None
        except Exception as e:
            status = "ERR "
            extra = f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
            if os.environ.get("CHECK_TRACE"):
                traceback.print_exc()
        dt = time.time() - t0
        line = f"{status} {key:34s} {dt:6.1f}s  {extra[:220]}"
        print(line, flush=True)
        if status.strip() == "OK":
            n_ok += 1
        else:
            n_fail += 1
            failures.append(line)
    print(f"\n{n_ok}/{n_ok + n_fail} passing")
    if failures:
        print("FAILURES:")
        for f in failures:
            print(" ", f)
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
