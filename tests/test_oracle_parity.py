"""The judged contract, run locally: every oracle-paired query must
hash-match DuckDB on sf0.01; every rows-only query must run and return
rows (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from lstore_spark.registry import ORACLE, QUERIES
from tests.oracle_check import compare

ORACLE_KEYS = sorted(ORACLE)
ROWS_ONLY_KEYS = sorted(set(QUERIES) - set(ORACLE))


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(key, spark, duck, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    res = compare(key, df, duck, ORACLE[key])
    assert res.ok, (
        f"{key}: {res.detail}\n"
        + "\n".join(f"  spark={a}\n  duck ={b}" for a, b in res.mismatches)
    )
    assert res.spark_rows > 0, f"{key}: empty result"


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only(key, spark, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    n = df.count()
    assert n > 0, f"{key}: rows-only query returned no rows"


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())
