"""Property-based cross-engine guarantees for the portable-hash layer
(llm/hashing.py) — the foundation under every oracle-checked operator
that hashes (sampling, splits, fingerprints, portable MinHash, the
linear-counting sketch).  Hypothesis drives arbitrary strings through
BOTH engines; any divergence here would silently corrupt a dozen
operator oracles."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lstore_spark.llm.hashing import sql_md5_long

# Printable-ASCII (no quotes/backslash to keep the SQL literal trivial —
# quoting is the harness's concern, not the hash's).
_TXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           exclude_characters="'\\"),
    min_size=0, max_size=64)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(s=_TXT, n=st.integers(min_value=1, max_value=12))
def test_md5_long_matches_across_engines(spark, s, n):
    expr = sql_md5_long("col1", n)
    got_spark = spark.sql(
        f"SELECT {expr} AS h FROM VALUES ('{s}') AS t(col1)").collect()[0].h
    got_duck = duckdb.sql(
        f"SELECT {expr} AS h FROM (VALUES ('{s}')) AS t(col1)").fetchone()[0]
    assert got_spark == got_duck
    assert 0 <= got_spark < 16 ** n


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(s=_TXT)
def test_tokenizer_matches_across_engines(spark, s):
    from lstore_spark.llm.text import _DUCK_TOKENS, _SPARK_TOKENS
    sp = spark.sql(
        f"SELECT {_SPARK_TOKENS.replace('text', 'col1')} AS ts "
        f"FROM VALUES ('{s}') AS t(col1)").collect()[0].ts
    dk = duckdb.sql(
        f"SELECT {_DUCK_TOKENS.replace('text', 'col1')} AS ts "
        f"FROM (VALUES ('{s}')) AS t(col1)").fetchone()[0]
    assert list(sp) == list(dk)
