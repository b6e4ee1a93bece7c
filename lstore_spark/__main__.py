"""Ad-hoc SQL entry point: ``python -m lstore_spark [options] "SQL"``.

The user-facing surface that makes the engine usable without writing a
driver script: registers the catalog tables (region nation customer
supplier part orders lineitem events documents embeddings) as temp
views over the chosen sf directory and executes arbitrary Spark SQL
against them.  Registered query keys are runnable by name too.

    python -m lstore_spark "SELECT o_orderpriority, count(*) \
        FROM orders GROUP BY 1"
    python -m lstore_spark --key q_tpch_q3_shipping
    python -m lstore_spark --sf /root/testdata/sf0.1 --format csv "..."
    python -m lstore_spark --list

Output formats: ``table`` (default, .show-style), ``csv``, ``json``
(one object per line).  ``--limit`` caps printed rows (default 100) by
PLANNING a limited query — Spark legitimately short-circuits the scan
once the limit is satisfied, so a side-effecting key that must run in
full should be invoked with a large ``--limit`` (review r13: the old
text promised full execution the plan never delivered).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m lstore_spark",
        description="Run SQL or a registered query key over the catalog tables.")
    ap.add_argument("sql", nargs="?", help="Spark SQL text to execute")
    ap.add_argument("--key", help="registered query key to run instead of SQL")
    from .catalog import default_sf_dir
    ap.add_argument("--sf", default=default_sf_dir(),
        help="table directory (default $LSTORE_SPARK_TEST_SF or sf0.01)")
    ap.add_argument("--format", choices=["table", "csv", "json"],
                    default="table")
    ap.add_argument("--limit", type=int, default=100,
                    help="max rows to print (default 100)")
    ap.add_argument("--list", action="store_true",
                    help="list registered query keys and exit")
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead of rows")
    args = ap.parse_args(argv)

    from .registry import QUERIES, load_all
    load_all()
    if args.list:
        for k in sorted(QUERIES):
            print(k)
        return 0
    if bool(args.sql) == bool(args.key):
        ap.error("provide exactly one of: SQL text, --key")

    from .catalog import register_views
    from .session import get_spark
    spark = get_spark("lstore-spark-sql")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.key:
            if args.key not in QUERIES:
                print(f"unknown key: {args.key}", file=sys.stderr)
                return 2
            df = QUERIES[args.key](spark, args.sf)
        else:
            register_views(spark, args.sf)
            df = spark.sql(args.sql)

        if args.explain:
            df.explain("formatted")
        elif args.format == "table":
            df.show(args.limit, truncate=False)
        else:
            rows = df.limit(args.limit).toPandas()
            if args.format == "csv":
                rows.to_csv(sys.stdout, index=False)
            else:
                rows.to_json(sys.stdout, orient="records", lines=True,
                             date_format="iso")
                print()
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
