"""Custom Python DataSource: read lstore-style segment files as a table.

The reference stores entries as an append-only sequence of
(int64-slots, blob-slots) records in mmap'd segment files (SURVEY.md
§1.1 — reconstruction; the mount was empty, so the binary layout here is
OUR OWN simple framing standing in for gocodec, documenting the
*plumbing*: a Spark 4 Python DataSource whose partitions are segment
files, so a directory of segments scans in parallel exactly like the
reference's segment list).

Segment framing (little-endian):
    record := offset:int64  n_ints:int32  ints[n_ints]:int64
              n_blobs:int32  (blob_len:int32 blob_bytes)*n_blobs

Worker importability: the DataSource class is pickled by reference, so
``register()`` ships the whole package to workers as a zip via
``SparkContext.addPyFile`` — no assumptions about worker PYTHONPATH.
"""

from __future__ import annotations

import os
import struct
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..catalog import load_table
from ..registry import query

SCHEMA_DDL = "offset bigint, ints array<bigint>, blobs array<binary>"


# ------------------------------------------------------------ writer (test rig)


def write_segment(path: str, records: list[tuple[int, list[int], list[bytes]]]) -> None:
    """Append-only segment writer (the lstore write path analog)."""
    with open(path, "wb") as f:
        for offset, ints, blobs in records:
            f.write(struct.pack("<qi", offset, len(ints)))
            for v in ints:
                f.write(struct.pack("<q", v))
            f.write(struct.pack("<i", len(blobs)))
            for b in blobs:
                f.write(struct.pack("<i", len(b)))
                f.write(b)


def write_segments(df: DataFrame, seg_dir: str) -> None:
    """Distributed segment sink (VERDICT r4 item 2): each task writes ONE
    ``.seg`` file for its partition — the write unit matches the storage
    unit exactly like the read path, and NO row ever moves through the
    driver.  ``df`` must have columns (offset bigint, ints array<bigint>,
    blobs array<binary>).

    Task-retry safety: each attempt writes ``.part-<pid>.seg.tmp-<task
    attempt>`` then atomically renames to ``part-<pid>.seg`` — a retried
    task republishes the same partition id, so the last rename wins and
    the store never exposes a torn file (the lstore appender's
    tmp+rename publish discipline).  On a real cluster ``seg_dir`` is a
    shared filesystem / object store mount; locally it's tmpfs.

    The closure is self-contained (stdlib only) so it pickles by value —
    no worker-side package import needed."""

    def _write_partition(rows) -> None:
        import os as _os
        import struct as _struct

        from pyspark import TaskContext

        tc = TaskContext.get()
        pid, attempt = tc.partitionId(), tc.taskAttemptId()
        tmp = _os.path.join(seg_dir, f".part-{pid:05d}.seg.tmp-{attempt}")
        wrote = False
        with open(tmp, "wb") as f:
            for r in rows:
                wrote = True
                ints, blobs = list(r[1]), list(r[2])
                f.write(_struct.pack("<qi", r[0], len(ints)))
                for v in ints:
                    f.write(_struct.pack("<q", v))
                f.write(_struct.pack("<i", len(blobs)))
                for b in blobs:
                    f.write(_struct.pack("<i", len(b)))
                    f.write(bytes(b))
        if wrote:
            _os.replace(tmp, _os.path.join(seg_dir, f"part-{pid:05d}.seg"))
        else:
            _os.remove(tmp)  # empty partition → no segment file

    df.select("offset", "ints", "blobs").foreachPartition(_write_partition)


def events_as_segment_rows(ev: DataFrame) -> DataFrame:
    """Shape an events slice into the segment record layout:
    ints=[event_id, ts_us, user_id], blobs=[event_type] — pure projection,
    stays JVM-side until the sink's Arrow hop."""
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        F.col("event_id").alias("offset"),
        F.array(F.col("event_id"), ts_us, F.col("user_id")).alias("ints"),
        F.array(F.encode(F.col("event_type"), "UTF-8")).alias("blobs"),
    )


def segments_as_events(raw: DataFrame) -> DataFrame:
    """Inverse of :func:`events_as_segment_rows`: re-type segment records
    to named event columns."""
    return raw.select(
        F.col("ints")[0].alias("event_id"),
        F.timestamp_micros(F.col("ints")[1]).cast("timestamp_ntz").alias("ts"),
        F.col("ints")[2].alias("user_id"),
        F.col("blobs")[0].cast("string").alias("event_type"),
    )


def read_segment_file(path: str):
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        offset, n_ints = struct.unpack_from("<qi", data, pos)
        pos += 12
        ints = list(struct.unpack_from(f"<{n_ints}q", data, pos))
        pos += 8 * n_ints
        (n_blobs,) = struct.unpack_from("<i", data, pos)
        pos += 4
        blobs = []
        for _ in range(n_blobs):
            (blen,) = struct.unpack_from("<i", data, pos)
            pos += 4
            blobs.append(bytes(data[pos: pos + blen]))
            pos += blen
        yield offset, ints, blobs


# ------------------------------------------------------------ the DataSource


class LstoreLogDataSource(DataSource):
    """spark.read.format("lstore_log").load(dir): one input partition per
    segment file — the parallel-scan unit matches the storage unit."""

    @classmethod
    def name(cls) -> str:
        return "lstore_log"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> "LstoreLogReader":
        return LstoreLogReader(self.options)

    def streamReader(self, schema) -> "LstoreLogStreamReader":
        return LstoreLogStreamReader(self.options)


class LstoreLogReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".seg")
        )
        return [InputPartition(f) for f in files]

    def read(self, partition):
        for offset, ints, blobs in read_segment_file(partition.value):
            yield (offset, ints, blobs)


class LstoreLogStreamReader(DataSourceStreamReader):
    """Streaming tail over a segment directory — the lstore consumer
    model made literal, in its SCALABLE form (upgraded r5 from a
    SimpleDataSourceStreamReader, which funnels every record through the
    driver): the driver does only O(#segments) metadata work and the
    executors read the bytes.

    Offset = the set of sealed segment files consumed so far (segments
    are write-once: the sink publishes them by atomic rename and never
    appends to a published file, so "new since my cursor" is exactly the
    filename-set difference — lstore's sealed-segment tail).  Each
    micro-batch plans ONE InputPartition per new segment, read in
    parallel on executors; restart replay is deterministic because
    ``partitions(start, end)`` is a pure function of the two offsets."""

    def __init__(self, options):
        self.path = options.get("path")

    def initialOffset(self) -> dict:
        return {"files": []}

    def _list_segments(self) -> list:
        return sorted(f for f in os.listdir(self.path) if f.endswith(".seg"))

    def latestOffset(self) -> dict:
        return {"files": self._list_segments()}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end["files"]) - set(start["files"]))
        return [InputPartition(os.path.join(self.path, f)) for f in new]

    def read(self, partition):
        yield from read_segment_file(partition.value)

    def commit(self, end: dict) -> None:
        pass  # the store is the source of truth; nothing to acknowledge


def _package_zip() -> str:
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(pkg_root)
    zpath = os.path.join(tempfile.gettempdir(), "lstore_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, repo))
    return zpath


def register(spark: SparkSession) -> None:
    spark.sparkContext.addPyFile(_package_zip())  # workers import by reference
    spark.dataSource.register(LstoreLogDataSource)


# ------------------------------------------------------------ oracle query


@query(
    "q_source_lstore_log",
    oracle="""
SELECT event_id, ts, user_id, event_type
FROM events WHERE event_id < 2000
""",
)
def q_source_lstore_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the reference's storage model: an event slice is
    written as segment files by the DISTRIBUTED sink (one ``.seg`` per
    partition, executor-side — no driver collect; VERDICT r4 item 2),
    read back via the custom DataSource in parallel, and re-typed to
    named columns.  Oracle compares against the original parquet — codec
    + sink + source fidelity end-to-end."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 2000))
    seg_dir = tempfile.mkdtemp(prefix="lstore_segments_")
    write_segments(events_as_segment_rows(ev).repartition(2, "offset"), seg_dir)
    register(spark)
    raw = spark.read.format("lstore_log").option("path", seg_dir).load()
    return segments_as_events(raw)


@query(
    "q_sink_lstore_log",
    oracle="""
SELECT event_type, COUNT(*) AS n,
       MIN(event_id) AS min_id, MAX(event_id) AS max_id,
       CAST(SUM(user_id % 1000000007) AS BIGINT) AS sum_user,
       CAST(SUM(epoch_us(ts) % 1000000007) AS BIGINT) AS sum_ts_us
FROM events
GROUP BY event_type
""",
)
def q_sink_lstore_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table segment sink round-trip: EVERY event row flows through
    the distributed writer (one segment per partition, executor-side),
    back through the parallel DataSource read, then into a per-type
    aggregate whose oracle recomputes from the original parquet — every
    field of every record must survive the binary codec for the sums to
    hash-match.  This is the lstore write path (writer.go [UNVERIFIED:
    pub], SURVEY.md §1.1) as a real sink: at 100 TB the same shape, one
    appender task per partition against a shared store, no driver hop."""
    ev = load_table(spark, sf_dir, "events")
    seg_dir = tempfile.mkdtemp(prefix="lstore_sink_")
    write_segments(events_as_segment_rows(ev).repartition(8, "offset"), seg_dir)
    register(spark)
    raw = spark.read.format("lstore_log").option("path", seg_dir).load()
    back = segments_as_events(raw)
    # checksums are mod-reduced per row (terms < 1e9) so the BIGINT sum
    # cannot overflow at any realistic row count (1e9 · rows ≪ 2^63 up
    # to ~9e9 rows/group; caught overflowing at the ~sf1 sweep otherwise)
    p = F.lit(1000000007)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.sum(F.col("user_id") % p).alias("sum_user"),
        F.sum(F.unix_micros(F.col("ts").cast("timestamp")) % p).alias("sum_ts_us"),
    )
