"""§2.10 Multimodal column operators.

Images/audio/video are opaque ``binary`` columns with typed metadata; the
Spark-side plumbing (schema, Arrow batching via mapInPandas, partitioning)
is real and tested, while the codec step is a clearly-marked deterministic
stub (decode libraries are not in this container — see _fake_decode).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType)

from ..catalog import fresh_scratch_dir, load_table
from ..registry import query


@query(
    "q_llm_multimodal_join",
    oracle="""
SELECT d.doc_id, d.lang, d.source, d.n_chars,
       e.label, len(e.embedding) AS dim
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
)
def q_llm_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row assembly: document ⋈ its embedding into one struct
    row (projected back flat for the oracle hash).  At scale: both sides
    bucketed by id → colocated join, embeddings stay columnar."""
    docs = load_table(spark, sf_dir, "documents")
    em = load_table(spark, sf_dir, "embeddings")
    joined = docs.join(em, docs.doc_id == em.vec_id)
    assembled = joined.select(
        F.struct("doc_id", "text", "lang", "source", "n_chars").alias("doc"),
        F.struct("embedding", "label").alias("vec"),
    )
    return assembled.select(
        F.col("doc.doc_id").alias("doc_id"),
        F.col("doc.lang").alias("lang"),
        F.col("doc.source").alias("source"),
        F.col("doc.n_chars").alias("n_chars"),
        F.col("vec.label").alias("label"),
        F.size("vec.embedding").alias("dim"),
    )


@query(
    "q_source_binaryfile",
    oracle="""
SELECT doc_id, CAST(16 AS BIGINT) AS n_bytes, md5(text) AS blob_hex
FROM documents WHERE text IS NOT NULL
""",
)
def q_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native multimodal ingest source: a directory of opaque
    media files read via ``format("binaryFile")`` — the production path
    for image/audio corpora at 100 TB (one row per file: path, length,
    content; Spark packs small files into partitions by
    ``maxPartitionBytes`` and pushes path/length filters into the
    listing).  Each document's deterministic 16-byte stand-in blob (md5
    of its text — same stub as q_llm_multimodal_features) is written as
    its own file by an executor-side ``foreachPartition`` writer
    (tmp+rename publish, no driver hop), then the directory is read
    back and every blob is fingerprinted.  The oracle recomputes the
    fingerprints from the source table, proving file-sink → binaryFile
    → content fidelity end-to-end."""
    import os

    # NULL text synthesizes no media: no file, no row — matching the
    # oracle's WHERE and keeping bytes(None) out of the writer
    # (review r11)
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", F.unhex(F.md5("text")).alias("media"))
            .filter(F.col("media").isNotNull()))
    out = fresh_scratch_dir("media", sf_dir)

    def write_blobs(rows) -> None:
        import os as _os
        for r in rows:
            tmp = _os.path.join(out, f".{r.doc_id}.bin.tmp")
            with open(tmp, "wb") as f:
                f.write(bytes(r.media))
            _os.replace(tmp, _os.path.join(out, f"{r.doc_id}.bin"))

    docs.foreachPartition(write_blobs)
    raw = spark.read.format("binaryFile").load(out)
    return raw.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
        .cast("bigint").alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.lower(F.hex("content")).alias("blob_hex"),
    )


@query(
    "q_llm_langdist_pivot",
    oracle="""
SELECT lang,
       CAST(COUNT(*) FILTER (source = 'src0') AS BIGINT) AS src0,
       CAST(COUNT(*) FILTER (source = 'src1') AS BIGINT) AS src1,
       CAST(COUNT(*) FILTER (source = 'src2') AS BIGINT) AS src2,
       CAST(COUNT(*) FILTER (source = 'src3') AS BIGINT) AS src3,
       CAST(COUNT(*) FILTER (source = 'src4') AS BIGINT) AS src4,
       CAST(COUNT(*) FILTER (source NOT IN ('src0','src1','src2','src3','src4'))
            AS BIGINT) AS other
FROM documents
GROUP BY lang
""",
)
def q_llm_langdist_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """language × source pivot of doc counts (explicit value list so the
    output schema is static — required both for the oracle and for a
    scalable single-pass pivot)."""
    docs = load_table(spark, sf_dir, "documents")
    srcs = ["src0", "src1", "src2", "src3", "src4"]
    bucketed = docs.withColumn(
        "src_bucket",
        # a NULL source lands in NO bucket (NULL src_bucket rows are
        # ignored by every pivot column), matching the oracle's
        # `source NOT IN (...)` evaluating to NULL for NULLs — the old
        # otherwise('other') counted them where the oracle did not
        # (review r11)
        F.when(F.col("source").isin(srcs), F.col("source"))
        .when(F.col("source").isNotNull(), F.lit("other")))
    return (
        bucketed.groupBy("lang")
        .pivot("src_bucket", srcs + ["other"])
        .count()
        .na.fill(0, srcs + ["other"])
    )


_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("resized_w", IntegerType()),
    StructField("resized_h", IntegerType()),
])

_REAL_DECODE = False  # no image/audio codecs in this container


def _fake_decode(blob: bytes) -> tuple[str, int, int]:
    """STUB decoder (deterministic).  A real deployment replaces this with
    PIL/ffmpeg inside the same mapInPandas batch loop; the Spark-side
    contract (binary in, typed features out, Arrow-batched) is unchanged.
    """
    if _REAL_DECODE:  # pragma: no cover
        raise NotImplementedError("codec libraries not available in container")
    fmt = ["png", "jpeg", "webp"][blob[0] % 3]
    width = 64 + (blob[1] % 64)
    height = 64 + (blob[2] % 64)
    return fmt, width, height


def _hex_byte(expr: str, i: int) -> str:
    """Byte value of hex digits (2i-1, 2i) of ``expr`` — portable SQL."""
    d = "instr('0123456789abcdef', substr({e}, {p}, 1)) - 1"
    hi = d.format(e=expr, p=2 * i - 1)
    lo = d.format(e=expr, p=2 * i)
    return f"(({hi}) * 16 + ({lo}))"


_RESIZE_MAX = 32  # thumbnail bound (longest edge)

_MM_ORACLE = f"""
WITH h AS (SELECT doc_id, md5(text) AS m FROM documents
           WHERE text IS NOT NULL),
dims AS (
  SELECT doc_id,
         16 AS n_bytes,
         CASE {_hex_byte('m', 1)} % 3 WHEN 0 THEN 'png'
                                      WHEN 1 THEN 'jpeg'
                                      ELSE 'webp' END AS format,
         CAST(64 + {_hex_byte('m', 2)} % 64 AS INT) AS width,
         CAST(64 + {_hex_byte('m', 3)} % 64 AS INT) AS height
  FROM h
)
SELECT doc_id, n_bytes, format, width, height,
       CAST(trunc(width * {_RESIZE_MAX} / greatest(width, height)) AS INT)
         AS resized_w,
       CAST(trunc(height * {_RESIZE_MAX} / greatest(width, height)) AS INT)
         AS resized_h
FROM dims
"""


@query("q_llm_multimodal_features", oracle=_MM_ORACLE)
def q_llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction over an opaque binary column.

    The fixture has no real media, so a deterministic binary payload is
    synthesized per document (md5 bytes of its text — stands in for image
    bytes); mapInPandas then 'decodes' each blob via the stubbed codec.
    Everything Spark-side is production-shaped: binary column, Arrow
    batches, per-partition decode loop, typed feature schema."""
    docs = load_table(spark, sf_dir, "documents")
    # no media -> no features row, both engines (review r11: a NULL
    # blob crashed the decode loop where the oracle's CASE NULL
    # accidentally fabricated a 'webp' row)
    with_blob = (docs.select(
        "doc_id", F.unhex(F.md5("text")).cast(BinaryType()).alias("media"))
        .filter(F.col("media").isNotNull()))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, sizes, rws, rhs = [], [], [], [], [], []
            for blob in pdf["media"]:
                b = bytes(blob)
                fmt, w, h = _fake_decode(b)
                # aspect-preserving thumbnail bound (integer floor —
                # matches the oracle's integer division exactly)
                m = max(w, h)
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                rws.append(w * _RESIZE_MAX // m)
                rhs.append(h * _RESIZE_MAX // m)
                sizes.append(len(b))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pd.Series(sizes, dtype="int32"),
                "format": fmts,
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "resized_w": pd.Series(rws, dtype="int32"),
                "resized_h": pd.Series(rhs, dtype="int32"),
            })

    return with_blob.mapInPandas(extract, schema=_FEATURE_SCHEMA)


_FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_bytes", IntegerType()),
    StructField("frame_md5", StringType()),
])

_FRAME_STRIDE = 2   # keep every 2nd frame
_N_FRAMES = 4       # synthetic "video" = 4 × 16-byte frames


@query(
    "q_llm_multimodal_framesample",
    oracle=f"""
WITH frames AS (
  SELECT doc_id, i AS frame_idx,
         md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR) || ':'
             || text) AS fhex
  FROM documents, range(0, {_N_FRAMES}) AS g(i)
  WHERE i % {_FRAME_STRIDE} = 0 AND text IS NOT NULL
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       16 AS frame_bytes, md5(fhex) AS frame_md5
FROM frames
""",
)
def q_llm_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: one opaque blob → N frame rows, keeping
    every ``_FRAME_STRIDE``-th frame (the decode-side data reduction
    every video training pipeline starts with).  The fixture has no real
    media, so each document synthesizes a deterministic 4-frame blob
    (16 md5 bytes per frame); mapInPandas splits the blob, strides, and
    fingerprints each kept frame — one input row yields several output
    rows through the Arrow batch iterator, exactly the real codec loop's
    shape (a real deployment swaps the splitter for ffmpeg keyframe
    extraction; schema and batching are unchanged)."""
    # NULL text synthesizes no video: no frames in either engine
    # (review r11: concat_ws SKIPS the NULL and fabricated real frame
    # hashes where the oracle's || NULL-propagated)
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull()))
    frame_hex = [
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"),
                          F.lit(str(i)), F.col("text")))
        for i in range(_N_FRAMES)
    ]
    with_blob = docs.select(
        "doc_id",
        F.unhex(F.concat(*frame_hex)).cast(BinaryType()).alias("media"))

    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, hashes = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                n = len(b) // 16
                for i in range(0, n, _FRAME_STRIDE):
                    frame = b[i * 16:(i + 1) * 16]
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(frame))
                    # md5 of the frame's hex — portable to the SQL twin
                    hashes.append(hashlib.md5(frame.hex().encode()).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_bytes": pd.Series(sizes, dtype="int32"),
                "frame_md5": hashes,
            })

    return with_blob.mapInPandas(sample, schema=_FRAME_SCHEMA)
