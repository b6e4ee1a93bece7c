"""Table catalog: declared schemas + loaders for the test corpus.

The reference's data model is a positional (int64 | blob) row log
(SURVEY.md §1.1); this engine upgrades it to named, typed Spark columns.
Schemas are *declared*, never inferred, so the DuckDB-oracle schema
comparison is stable (SURVEY.md §1.3).

``events.ts`` encoding varies across testdata generations: round 1-2 data
stored INT64 TIMESTAMP(NANOS,false) (which Spark 4 cannot read natively —
``spark.sql.legacy.parquet.nanosAsLong`` reads it as a raw nanosecond
long, and the loader derives ``ts = timestamp_micros(ts div 1000)``,
matching DuckDB's truncate-to-micros read), while round 3+ data stores
TIMESTAMP(MICROS,false), which both engines read natively.  The loader
sniffs the parquet footer (one driver-side metadata read, cached per
path) and picks the matching read path, so either encoding yields the
same logical view: ``ts`` as TIMESTAMP_NTZ at microsecond precision.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from .session import tune

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# Physical (as-stored) schemas; FIXTURES.md, verified with pyarrow.
SCHEMAS: dict[str, StructType] = {
    "region": _st(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _st(("n_nationkey", IntegerType()), ("n_name", StringType()),
                  ("n_regionkey", IntegerType())),
    "supplier": _st(("s_suppkey", LongType()), ("s_name", StringType()),
                    ("s_nationkey", IntegerType()), ("s_acctbal", DoubleType())),
    "customer": _st(("c_custkey", LongType()), ("c_name", StringType()),
                    ("c_nationkey", IntegerType()), ("c_acctbal", DoubleType()),
                    ("c_mktsegment", StringType())),
    "part": _st(("p_partkey", LongType()), ("p_name", StringType()),
                ("p_brand", StringType()), ("p_type", StringType()),
                ("p_size", IntegerType()), ("p_retailprice", DoubleType())),
    "orders": _st(("o_orderkey", LongType()), ("o_custkey", LongType()),
                  ("o_orderstatus", StringType()), ("o_totalprice", DoubleType()),
                  ("o_orderdate", TimestampNTZType()), ("o_orderpriority", StringType())),
    "lineitem": _st(("l_orderkey", LongType()), ("l_partkey", LongType()),
                    ("l_suppkey", LongType()), ("l_linenumber", IntegerType()),
                    ("l_quantity", DoubleType()), ("l_extendedprice", DoubleType()),
                    ("l_discount", DoubleType()), ("l_tax", DoubleType()),
                    ("l_returnflag", StringType()), ("l_linestatus", StringType()),
                    ("l_shipdate", TimestampNTZType())),
    # ts read as raw nanos (legacy.parquet.nanosAsLong), converted in load().
    # Only used when the footer says NANOS; MICROS files use EVENTS_LOGICAL.
    "events": _st(("event_id", LongType()), ("ts", LongType()),
                  ("user_id", LongType()), ("event_type", StringType()),
                  ("value", DoubleType()), ("props", StringType())),
    "documents": _st(("doc_id", LongType()), ("text", StringType()),
                     ("lang", StringType()), ("source", StringType()),
                     ("n_chars", LongType())),
    "embeddings": _st(("vec_id", LongType()), ("embedding", ArrayType(FloatType())),
                      ("label", IntegerType())),
}

EMBEDDING_DIM = 64

# Logical view of events (ts already a microsecond TIMESTAMP_NTZ) — the
# schema every operator sees, and the direct read schema for MICROS files.
EVENTS_LOGICAL = _st(
    ("event_id", LongType()), ("ts", TimestampNTZType()),
    ("user_id", LongType()), ("event_type", StringType()),
    ("value", DoubleType()), ("props", StringType()),
)


def path_of(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def scratch_dir(tag: str, sf_dir: str) -> tuple[str, bool]:
    """Deterministic per-fixture scratch dir for derived artifacts
    (layout rewrites, ANN indexes): ``/tmp/lstore_spark_<tag>_<hash>``
    keyed on the fixture path.  Returns (path, already_built) where
    ``already_built`` is True only when a prior write committed a
    ``_SUCCESS`` marker at the DIR ROOT (crashed half-writes rebuild).
    Multi-table artifacts (the ANN indexes) write no root marker —
    their builders ignore the flag and gate on their own subdir
    markers (e.g. ``postings/_SUCCESS``); callers must pick ONE of the
    two conventions per tag and not mix them.  ``tag`` MUST
    carry a format version (e.g. ``dpp1``, ``annidx3``) — bump it when
    the producing code changes so stale artifacts can never be served
    (review r8: an untagged cache would keep passing against an old
    layout after a code change, silently un-exercising the write
    path).  The key also folds in a (name, size, mtime) fingerprint of
    the fixture's parquet entries, so a REGENERATED fixture at the same
    path gets a fresh scratch dir instead of being served artifacts
    derived from the old data (second r8 review finding — previously
    this relied on the round-boundary /tmp wipe); unchanged fixtures
    keep their key, so cross-session artifact reuse still works."""
    import hashlib
    import tempfile

    key_src = os.path.abspath(sf_dir)
    try:
        with os.scandir(sf_dir) as entries:
            sig = sorted(
                (e.name, e.stat().st_size, e.stat().st_mtime_ns)
                for e in entries if e.name.endswith(".parquet"))
        key_src += repr(sig)
    except OSError:
        pass  # fixture dir missing: fall back to the path-only key
    key = hashlib.md5(key_src.encode()).hexdigest()[:10]
    out = os.path.join(tempfile.gettempdir(), f"lstore_spark_{tag}_{key}")
    return out, os.path.exists(os.path.join(out, "_SUCCESS"))


def fresh_scratch_dir(tag: str, sf_dir: str) -> str:
    """Deterministic per-(tag, fixture) scratch dir, WIPED on every
    call — for sink/round-trip/segment-store keys whose WRITE is the
    exercised path (reuse would skip it).  Replaces the per-invocation
    ``tempfile.mkdtemp`` those keys used: the ADVICE-r7 leak class —
    every sweep/bench/test invocation minted a fresh fixture-sized
    directory that nothing ever removed (measured: ~1,500 dirs after a
    round of sweeps, the binaryFile media copies at ~200 MB each).
    One live copy per (key, fixture) now bounds the steady-state /tmp
    footprint.  Not safe under CONCURRENT invocations of the same key
    on the same fixture (the wipe races the other session's read) —
    sweeps, bench, and the driver all run keys sequentially."""
    import shutil

    out, _ = scratch_dir(tag, sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    return out


_ROWS_CACHE: dict[str, int] = {}


def table_rows(sf_dir: str, name: str) -> int:
    """Exact table row count from parquet footer metadata — a driver-side
    catalog read, no Spark job.  Replaces the ``df.count()`` pre-scans
    that sized LSH parameters (VERDICT r2 item 7): at 100 TB a sizing
    count must come from table statistics, not a full extra scan."""
    path = path_of(sf_dir, name)
    n = _ROWS_CACHE.get(path)
    if n is None:
        import pyarrow.parquet as pq
        n = pq.ParquetFile(path).metadata.num_rows
        _ROWS_CACHE[path] = n
    return n


_TS_UNIT_CACHE: dict[str, str] = {}


def events_ts_unit(path: str) -> str:
    """Physical unit of ``events.ts`` in this parquet file: 'ns' or 'us'.

    One driver-side footer read via pyarrow, cached per path — at cluster
    scale this is catalog metadata, not a data scan.  Falls back to 'us'
    (the current generator encoding) if the footer can't be sniffed.
    """
    unit = _TS_UNIT_CACHE.get(path)
    if unit is None:
        try:
            import pyarrow.parquet as pq
            t = str(pq.ParquetFile(path).schema_arrow.field("ts").type)
            unit = "ns" if "[ns]" in t else "us"
        except Exception:
            unit = "us"
        _TS_UNIT_CACHE[path] = unit
    return unit


# DataFrames are immutable logical plans, so caching them per
# (session, sf_dir, table) is safe and shaves the reader-construction +
# file-listing cost off every query in a sweep (the driver's CORRECTNESS
# sweep is overhead-dominated at sf0.01 — VERDICT r1 item 2).
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table with its declared schema (logical view).

    ``events`` comes back with ``ts`` as TIMESTAMP_NTZ at microsecond
    precision — exactly what DuckDB's view of the same parquet sees.
    """
    key = (id(spark), sf_dir.rstrip("/"), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    tune(spark)
    path = path_of(sf_dir, name)
    if name == "events":
        if events_ts_unit(path) == "ns":
            df = spark.read.schema(SCHEMAS[name]).parquet(path).withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast(TimestampNTZType()),
            )
        else:
            df = spark.read.schema(EVENTS_LOGICAL).parquet(path)
    else:
        df = spark.read.schema(SCHEMAS[name]).parquet(path)
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> dict[str, DataFrame]:
    """Register temp views so operators can also be expressed via spark.sql."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
