"""Property-based checks for the late round-7 analytics operators,
driving the PRODUCTION expression builders (analytics.ewma_num_den /
hist_cum / hist_pick — the same objects the registered queries are
built from, so a regression in the real code fails here too) against
plain-Python references, plus the numerics.dsum9 order-independence
guarantee the entropy keys lean on.

These are the §5.2 discipline for shapes whose DuckDB oracle only
certifies one fixture: hypothesis drives arbitrary inputs (ties,
singletons, ramp-up edges) through operator and reference."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from lstore_spark.operators.analytics import ewma_num_den, hist_cum, hist_pick


def _ref_ewma(values: list[float]) -> list[float]:
    """The q_ts_ewma contract in plain Python: 8-tap 2^-i kernel over
    the available history, renormalized by the present-weight sum."""
    out = []
    for t in range(len(values)):
        num = den = 0.0
        for i in range(8):
            if t - i < 0:
                break
            w = 2.0 ** -i
            num += values[t - i] * w
            den += w
        out.append(num / den)
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(series=st.lists(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=20))
def test_ewma_matches_python_reference(spark, series):
    """One user, arbitrary series (incl. the 1-sample and <8-sample
    ramp-up edges) — the production ewma_num_den unroll must equal the
    sequential reference to float equality of the same arithmetic."""
    rows = [(i, 1, float(i), v) for i, v in enumerate(series)]
    df = spark.createDataFrame(
        rows, "event_id: long, user_id: long, ts: double, value: double")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num, den = ewma_num_den(w)
    got = [r.ewma for r in df.select(
        "event_id", (num / den).alias("ewma")).orderBy("event_id").collect()]
    want = _ref_ewma(series)
    assert len(got) == len(want)
    for g, r in zip(got, want):
        assert math.isclose(g, r, rel_tol=1e-12, abs_tol=1e-12), (g, r)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sizes=st.lists(st.integers(min_value=1, max_value=40),
                      min_size=1, max_size=30))
def test_hist_percentiles_match_bruteforce(spark, sizes):
    """The production hist_cum/hist_pick percentile (cfreq·m ≥ q·n
    integer comparisons) must equal the ceil-rank element of the sorted
    values — the definition a brute-force sort gives."""
    df = spark.createDataFrame([(n,) for n in sizes], "n: long")
    got = hist_cum(df, "n").agg(
        hist_pick(2, 1, "n").alias("p50"),
        hist_pick(10, 9, "n").alias("p90"),
        hist_pick(100, 99, "n").alias("p99")).collect()[0]
    srt = sorted(sizes)

    def ref(q):
        return srt[math.ceil(q * len(srt)) - 1]

    assert got.p50 == ref(0.50), (got.p50, ref(0.50), srt)
    assert got.p90 == ref(0.90), (got.p90, ref(0.90), srt)
    assert got.p99 == ref(0.99), (got.p99, ref(0.99), srt)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.floats(min_value=-1e3, max_value=1e3,
              allow_nan=False, allow_infinity=False),
    min_size=2, max_size=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_dsum9_order_independent(spark, vals, seed):
    """numerics.dsum9 (round-at-1e-9 then exact decimal sum) must give
    the IDENTICAL double regardless of row order / partitioning — the
    property the entropy keys' cross-engine hashes rest on."""
    import random

    from lstore_spark.numerics import dsum9
    shuffled = vals[:]
    random.Random(seed).shuffle(shuffled)
    a = (spark.createDataFrame([(v,) for v in vals], "x: double")
         .repartition(7).agg(dsum9(F.col("x")).alias("s")).collect()[0].s)
    b = (spark.createDataFrame([(v,) for v in shuffled], "x: double")
         .repartition(3).agg(dsum9(F.col("x")).alias("s")).collect()[0].s)
    assert a == b, (a, b)
