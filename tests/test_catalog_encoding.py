"""Regression tests for the events.ts encoding sniffing (the round-3
incident: driver-regenerated testdata switched TIMESTAMP(NANOS) →
TIMESTAMP(MICROS) and the unconditional nanos workaround produced 1970
timestamps on 9 previously-green keys).  The catalog must yield the
same logical view — TIMESTAMP_NTZ at microsecond values — for BOTH
physical encodings of the same data."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lstore_spark.catalog import events_ts_unit, load_table


@pytest.fixture(scope="module")
def dual_dirs(tmp_path_factory):
    """Two sf-dir clones of a tiny events table: one µs-encoded, one
    ns-encoded, identical logical values."""
    base = str(tmp_path_factory.mktemp("lstore_enc"))
    us_dir, ns_dir = f"{base}/us", f"{base}/ns"
    os.makedirs(us_dir), os.makedirs(ns_dir)
    ts_us = [1704067200_000007, 1704067201_500000, 1704153599_999999]
    cols = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 11, 10], pa.int64()),
        "event_type": pa.array(["view", "purchase", "view"]),
        "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
        "props": pa.array(['{"k":1}', '{"k":2}', '{"k":3}']),
    }
    t_us = pa.table({**cols, "ts": pa.array(ts_us, pa.timestamp("us"))})
    t_ns = pa.table({**cols,
                     "ts": pa.array([v * 1000 for v in ts_us],
                                    pa.timestamp("ns"))})
    pq.write_table(t_us, f"{us_dir}/events.parquet")
    pq.write_table(t_ns, f"{ns_dir}/events.parquet",
                   store_schema=False)  # raw TIMESTAMP(NANOS) footer
    yield us_dir, ns_dir
    shutil.rmtree(base, ignore_errors=True)


def test_unit_sniffing(dual_dirs):
    us_dir, ns_dir = dual_dirs
    assert events_ts_unit(f"{us_dir}/events.parquet") == "us"
    assert events_ts_unit(f"{ns_dir}/events.parquet") == "ns"


def test_both_encodings_load_identically(spark, dual_dirs):
    us_dir, ns_dir = dual_dirs
    a = sorted(map(tuple, load_table(spark, us_dir, "events").collect()))
    b = sorted(map(tuple, load_table(spark, ns_dir, "events").collect()))
    assert a == b
    # and the logical type is the contract: microsecond TIMESTAMP_NTZ
    df = load_table(spark, us_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    years = {r.ts.year for r in df.select("ts").collect()}
    assert years == {2024}, f"wrong epoch interpretation: {years}"


def test_events_ts_unit_sniffs_directory_tables(tmp_path):
    """review r12: directory-style events tables are first-class
    everywhere else, but ParquetFile(dir) raised and the blanket 'us'
    fallback mis-routed NANOS directory tables; and the dir-sniff must
    NOT misread legacy INT96 (Spark-written) timestamps as raw-long
    nanos — pyarrow reports both as timestamp[ns], only INT64 NANOS
    takes the nanosAsLong path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lstore_spark.catalog import events_ts_unit

    d = tmp_path / "events.parquet"
    d.mkdir()
    t = pa.table({"event_id": pa.array([1], pa.int64()),
                  "ts": pa.array([1700000000000000000],
                                 pa.timestamp("ns"))})
    pq.write_table(t, str(d / "part-0.parquet"),
                   coerce_timestamps=None, allow_truncated_timestamps=False)
    assert events_ts_unit(str(d)) == "ns"
    # µs directory table
    d2 = tmp_path / "events2.parquet"
    d2.mkdir()
    t2 = pa.table({"event_id": pa.array([1], pa.int64()),
                   "ts": pa.array([1700000000000000], pa.timestamp("us"))})
    pq.write_table(t2, str(d2 / "part-0.parquet"))
    assert events_ts_unit(str(d2)) == "us"
