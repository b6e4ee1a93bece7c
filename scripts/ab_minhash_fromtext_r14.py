"""REJECTED candidate (r14 session 2): minhash signatures computed from
RAW TEXT inside the Arrow UDF — pyarrow split + a vectorized numpy port
of Spark's Murmur3_x86_32 STRING hash (LE word unroll, sign-extended
tail bytes, fmix-by-length; the same algorithm the hash-green DuckDB
oracle spells in SQL) — instead of shipping JVM-computed token-hash
arrays through Arrow.

Hypothesis (guide §4.1): the JVM side's interpreted HOFs
(filter(split(...)) + transform(ts, t -> hash(t))) cost ~3.3 s of the
9.3 s key at the 100× fixture; moving tokenize+hash to numpy removes
them.

Measured (5 interleaved reps, quiet window, this script):

  sf0.1  : text 1.127 s median / 0.982 min   vs jvm_tok 1.082 / 0.994
  sf100x : text 12.899 / 12.791              vs jvm_tok 9.254 / 9.019

REJECTED — the text arm loses ALL FIVE interleaved pairs at 100×
(~1.4× slower): shipping raw text costs more than it saves — the
pandas→pyarrow re-encode of 500k Python strings, the bigger Arrow
payload (text bytes vs 4 B/token), and the gather-heavy numpy word
unroll together exceed the interpreted-HOF cost, while the JVM path
hashes each token's bytes once in place during the scan projection.
Bit-parity of the candidate WAS verified before timing (exceptAll 0
both ways vs the shipped form over sf0.01 + degenerate/multibyte edge
docs and an all-null batch), so this is a pure performance rejection.

Run: python scripts/ab_minhash_fromtext_r14.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lstore_spark.catalog import load_table  # noqa: E402
from lstore_spark.llm.dedup import (  # noqa: E402
    _BANDS, _MINHASH_K, _MINHASH_R, lsh_candidate_pairs,
    minhash_signatures)
from lstore_spark.session import get_spark  # noqa: E402

SF_DIRS = os.environ.get(
    "AB_SF_DIRS", "/root/testdata/sf0.1,/tmp/sf100x").split(",")
REPS = int(os.environ.get("REPS", "5"))


def spark_murmur3_bytes(data, starts, lens, seed=42):
    """Vectorized Spark hash() over UTF-8 byte slices (candidate's
    primitive; elementwise JVM parity was verified over every fixture
    token plus 0–39-byte/multibyte/tail-length adversaries)."""
    import numpy as np

    u = np.uint32
    n = len(starts)
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    h = np.full(n, seed, dtype=np.uint32)
    nwords = lens >> 2
    for w in range(int(nwords.max()) if n else 0):
        msk = nwords > w
        idx = starts[msk] + 4 * w
        word = (data[idx].astype(u)
                | (data[idx + 1].astype(u) << u(8))
                | (data[idx + 2].astype(u) << u(16))
                | (data[idx + 3].astype(u) << u(24)))
        k1 = word * u(0xCC9E2D51)
        k1 = (k1 << u(15)) | (k1 >> u(17))
        k1 = k1 * u(0x1B873593)
        hm = h[msk] ^ k1
        hm = (hm << u(13)) | (hm >> u(19))
        h[msk] = hm * u(5) + u(0xE6546B64)
    tails = lens & 3
    base = starts + 4 * nwords
    for tb in range(3):
        msk = tails > tb
        if not msk.any():
            break
        b = data[base[msk] + tb].astype(np.int8).astype(np.int32) \
            .astype(np.uint32)  # tail bytes are SIGN-extended
        k1 = b * u(0xCC9E2D51)
        k1 = (k1 << u(15)) | (k1 >> u(17))
        k1 = k1 * u(0x1B873593)
        hm = h[msk] ^ k1
        hm = (hm << u(13)) | (hm >> u(19))
        h[msk] = hm * u(5) + u(0xE6546B64)
    h = h ^ lens.astype(np.uint32)
    h = h ^ (h >> u(16))
    h = h * u(0x85EBCA6B)
    h = h ^ (h >> u(13))
    h = h * u(0xC2B2AE35)
    h = h ^ (h >> u(16))
    return h


def minhash_signatures_from_text(docs, k=_MINHASH_K):
    """The candidate: struct<mhs, bkts> signatures computed from the
    raw text column (tokenize + string-hash + shingles + permutations
    + band buckets all in one Arrow UDF)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (ArrayType, IntegerType, StructField,
                                   StructType)

    from lstore_spark.llm.similarity import spark_murmur3_int

    r_rows, n_bands = _MINHASH_R, _BANDS
    out_type = StructType([StructField("mhs", ArrayType(IntegerType())),
                           StructField("bkts", ArrayType(IntegerType()))])

    @F.pandas_udf(out_type)
    def mh_sig_text(text_col):
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.Array.from_pandas(text_col)
        if pa.types.is_large_string(arr.type) or pa.types.is_null(arr.type):
            arr = arr.cast(pa.string())
        n = len(arr)
        toks = pc.split_pattern(arr, " ")
        lo = toks.offsets.to_numpy().astype(np.int64)
        child = toks.values
        off_np = np.frombuffer(child.buffers()[1], dtype=np.int32)
        vo = off_np[child.offset:
                    child.offset + len(child) + 1].astype(np.int64)
        data = np.frombuffer(child.buffers()[2], dtype=np.uint8)
        abs_idx = np.arange(lo[0], lo[-1], dtype=np.int64)
        t_start = vo[abs_idx]
        t_len = vo[abs_idx + 1] - t_start
        dt_raw = lo[1:] - lo[:-1]
        doc_of_tok = np.repeat(np.arange(n, dtype=np.int64), dt_raw)
        keep = t_len > 0
        if toks.null_count:
            null_doc = np.asarray(toks.is_null())
            keep &= ~null_doc[doc_of_tok]
        m = np.bincount(doc_of_tok[keep], minlength=n).astype(np.int64)
        th = spark_murmur3_bytes(data, t_start[keep], t_len[keep], seed=42)
        n_docs = n
        padded = m + 3
        starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(padded[:-1], out=starts[1:])
        flat = np.zeros(int(padded.sum()), dtype=np.uint32)
        if int(m.sum()):
            tok_starts = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(m[:-1], out=tok_starts[1:])
            local = (np.arange(int(m.sum()), dtype=np.int64)
                     - np.repeat(tok_starts, m))
            flat[np.repeat(starts, m) + local] = th
        n_sh = np.maximum(m - 2, 1)
        total_sh = int(n_sh.sum())
        sh_starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(n_sh[:-1], out=sh_starts[1:])
        pos = (np.repeat(starts, n_sh)
               + np.arange(total_sh, dtype=np.int64)
               - np.repeat(sh_starts, n_sh))
        h = spark_murmur3_int(flat[pos], np.uint32(42))
        h = spark_murmur3_int(flat[pos + 1], h)
        h = spark_murmur3_int(flat[pos + 2], h)
        s1 = spark_murmur3_int(h, np.uint32(42))
        sig = np.empty((n_docs, k), dtype=np.int32)
        one = np.ones(1, dtype=np.uint32)
        for p in range(k):
            hp = spark_murmur3_int(one * np.uint32(p), s1).view(np.int32)
            sig[:, p] = np.minimum.reduceat(hp, sh_starts)
        bk = np.empty((n_docs, n_bands), dtype=np.int32)
        for bnd in range(n_bands):
            hh = np.full(n_docs, 42, dtype=np.uint32)
            for j in range(r_rows):
                hh = spark_murmur3_int(sig[:, bnd * r_rows + j], hh)
            bk[:, bnd] = hh.view(np.int32)
        return pd.DataFrame({"mhs": list(sig), "bkts": list(bk)})

    return docs.select("doc_id", mh_sig_text("text").alias("_s")) \
               .select("doc_id", F.col("_s.mhs").alias("mhs"),
                       F.col("_s.bkts").alias("bkts"))


def full_key(spark, sf_dir: str, from_text: bool):
    docs = load_table(spark, sf_dir, "documents")
    sig = (minhash_signatures_from_text(docs) if from_text
           else minhash_signatures(docs, with_buckets=True)).localCheckpoint()
    pairs = lsh_candidate_pairs(sig)
    mates = (pairs.select(F.explode(F.array("id_a", "id_b")).alias("doc_id"),
                          "est_jaccard")
             .groupBy("doc_id")
             .agg(F.count(F.lit(1)).alias("n_mates"),
                  F.max("est_jaccard").alias("best_est_jaccard")))
    return (sig.select("doc_id").join(mates, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_mates", F.lit(0)).alias("n_mates"),
                    F.coalesce("best_est_jaccard",
                               F.lit(0.0)).alias("best_est_jaccard")))


def main() -> None:
    spark = get_spark("ab-minhash-fromtext-r14")
    spark.sparkContext.setLogLevel("ERROR")
    # parity gate before any timing
    docs = load_table(spark, SF_DIRS[0], "documents").select("doc_id", "text")
    a = minhash_signatures_from_text(docs)
    b = minhash_signatures(docs, with_buckets=True)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for sf_dir in SF_DIRS:
        times = {"text": [], "jvm_tok": []}
        for arm, ft in (("text", True), ("jvm_tok", False)):
            noop(full_key(spark, sf_dir, ft))  # codegen warm-up
        for i in range(REPS):
            for arm, ft in (("text", True), ("jvm_tok", False)):
                spark.sparkContext.setJobDescription(f"ab-ft:{arm}:{i}")
                t0 = time.perf_counter()
                noop(full_key(spark, sf_dir, ft))
                times[arm].append(round(time.perf_counter() - t0, 3))
        out[sf_dir] = {
            a_: {"runs": v, "median": round(statistics.median(v), 3),
                 "min": min(v)} for a_, v in times.items()}
        print(f"# {sf_dir}: {out[sf_dir]}", file=sys.stderr)
    print(json.dumps({"reps": REPS, "arms": out}))
    spark.stop()


if __name__ == "__main__":
    main()
