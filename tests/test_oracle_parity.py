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


def test_uncast_hugeint_oracle_fails(spark, duck):
    """Regression guard for the driver's pandas fetch path (VERDICT r2
    items 2-3): DuckDB returns integer SUM windows as HUGEINT, which
    ``.df()`` degrades to float64 ("1.0"), while Spark keeps int64
    ("1").  The harness must FLAG that, not hide it the way
    ``fetchall()`` did — an oracle with an uncast ``SUM(int) OVER``
    must therefore fail compare() even though values are numerically
    identical."""
    sdf = spark.range(3).selectExpr("id", "CAST(id + 1 AS BIGINT) AS rsum")
    bad = ("SELECT CAST(x AS BIGINT) AS id, SUM(y) OVER (ORDER BY x) AS rsum "
           "FROM (SELECT 0 AS x, 1 AS y UNION ALL SELECT 1, 1 UNION ALL SELECT 2, 1)")
    res = compare("uncast_hugeint_probe", sdf, duck, bad)
    assert not res.ok, "uncast HUGEINT oracle column should hash-mismatch"
    good = bad.replace("SUM(y) OVER (ORDER BY x)",
                       "CAST(SUM(y) OVER (ORDER BY x) AS BIGINT)")
    res2 = compare("cast_hugeint_probe", sdf, duck, good)
    assert res2.ok, res2.detail


def test_counter_rate_single_sample_group(spark, tmp_path):
    """ADVICE r6: a user with exactly ONE event has delta = NULL for
    its only row — n_resets must come out 0 (as the oracle's CASE WHEN
    does), not NULL (as a bare SUM over an all-NULL group would).  The
    shipped fixtures happen to give every user ≥2 events, so hash
    parity only holds on other data if the NULL guard is real."""
    import datetime as dt

    import duckdb

    from lstore_spark.registry import ORACLE, QUERIES
    from tests.oracle_check import compare

    rows = [
        # user 1: one event — the degenerate group under test
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "view", 1.0, "{}"),
    ] + [
        # user 2: eleven events, each contributing 96 to the running
        # counter (event_id ≡ 96 mod 97), so the % 1000 counter WRAPS at
        # the 11th (960 → 56) — a genuine reset exercising the
        # `delta < 0 → counter` arm, not just the NULL guard
        (96 + 97 * k, dt.datetime(2024, 1, 1, 0, 0, 1 + k), 2, "view",
         1.0, "{}")
        for k in range(11)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW events AS SELECT * "
                 f"FROM '{tmp_path}/events.parquet/*.parquet'")
    res = compare("q_ts_counter_rate",
                  QUERIES["q_ts_counter_rate"](spark, str(tmp_path)),
                  duck, ORACLE["q_ts_counter_rate"])
    assert res.ok, res.detail
    out = {r.user_id: r for r in
           QUERIES["q_ts_counter_rate"](spark, str(tmp_path)).collect()}
    assert out[1].n_resets == 0 and out[1].n_samples == 1
    assert out[2].n_resets == 1 and out[2].n_samples == 11


def test_latest_by_key_skips_null_args_like_arg_max(spark, tmp_path):
    """review r13 latent-guard class: DuckDB's arg_max SKIPS rows whose
    arg is NULL while a naive Spark max_by returns the NULL at the true
    max offset.  Plant a user whose newest event has NULL event_type
    (and another whose newest has NULL value) and require hash parity
    plus the per-column fall-back-to-latest-non-NULL semantics."""
    import datetime as dt

    import duckdb

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: newest (id 12) has NULL type — last_type falls back
        # to id 11's; last_value keeps id 12's
        (11, t0, 1, "view", 1.5, "{}"),
        (12, t0, 1, None, 2.5, "{}"),
        # user 2: newest (id 22) has NULL value — symmetric fallback
        (21, t0, 2, "click", 7.0, "{}"),
        (22, t0, 2, "purchase", None, "{}"),
        # user 3: ONLY NULL-type rows — last_type is NULL in both
        (31, t0, 3, None, 9.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW events AS SELECT * "
                 f"FROM '{tmp_path}/events.parquet/*.parquet'")
    res = compare("q_scan_latest_by_key",
                  QUERIES["q_scan_latest_by_key"](spark, str(tmp_path)),
                  duck, ORACLE["q_scan_latest_by_key"])
    assert res.ok, res.detail
    out = {r.user_id: r for r in
           QUERIES["q_scan_latest_by_key"](spark, str(tmp_path)).collect()}
    assert out[1].last_type == "view" and out[1].last_value == 2.5
    assert out[2].last_type == "purchase" and out[2].last_value == 7.0
    assert out[3].last_type is None and out[3].last_value == 9.0


def test_json_contracts_agree_on_degenerate_payloads(spark, tmp_path):
    """review r13: the three JSON-typed-extraction keys must agree with
    their oracles on payloads the fixture never ships — float k,
    quoted-numeric k, quoted-float k, non-numeric k, boolean k, and a
    NULL value column.  Before this round: q_fn_json CRASHED under
    Spark 4's ANSI cast on '12.5'; the q_udf_scalar_python oracle
    ROUNDED '12.5' to 13 and parsed quoted strings the strict-int UDF
    rejects; the q_fn_variant oracle hard-errored on a string k."""
    import datetime as dt

    import duckdb

    t0 = dt.datetime(2024, 1, 1)
    payloads = ['{"k": 12}', '{"k": 12.5}', '{"k": "12"}', '{"k": "12.5"}',
                '{"k": "n/a"}', '{"k": true}', '{"k": null}', '{}',
                '{"k": -7}', '{"k": -12.7}']
    rows = [(i, t0, i % 3, "view", float(i), p)
            for i, p in enumerate(payloads)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW events AS SELECT * "
                 f"FROM '{tmp_path}/events.parquet/*.parquet'")
    for key in ("q_fn_json", "q_udf_scalar_python", "q_fn_variant"):
        res = compare(key, QUERIES[key](spark, str(tmp_path)),
                      duck, ORACLE[key])
        assert res.ok, f"{key}: {res.detail}"
    # spot-pin the shared integer contract
    out = {r.event_id: r for r in
           QUERIES["q_fn_json"](spark, str(tmp_path)).collect()}
    assert out[0].k_int == 12 and out[8].k_int == -7
    # get_json_object / ->> UNQUOTE string payloads, so a quoted bare
    # integer parses in both engines; everything non-integer is NULL
    assert out[2].k_int == 12
    assert all(out[i].k_int is None for i in (1, 3, 4, 5, 6, 7, 9))
    # variant: numbers truncate toward zero, bare-integer strings parse
    vout = {}
    for r in QUERIES["q_fn_variant"](spark, str(tmp_path)).collect():
        vout[r.event_type] = r
    assert vout["view"].n == len(payloads)
