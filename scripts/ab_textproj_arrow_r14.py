"""REJECTED candidates (r14 session 2): Arrow/mapInArrow ports of the
q_llm_text_fingerprint and q_llm_text_repetition per-doc projections.

Both were built, bit-parity-verified (exceptAll 0 both ways vs the HOF
twins over sf0.01 + degenerate/multibyte docs), and beat the HOF forms
while BOTH arms ran on the under-split 2-partition 100× text scan
(fingerprint 55.1 vs 41.6 s is the one exception — the per-span Python
md5 call loop lost even there).  With catalog.spread_rows fixing the
stage parallelism (the real lever; scripts/ab_repart_r14.json), the
HOF forms win decisively and ship:

  fingerprint: HOF+spread 5.37 s  vs  arrow+spread 9.89 s  (flat HOF 41.6)
  repetition:  HOF+spread 3.09 s  vs  arrow+spread 5.83 s  (flat HOF 33.7)

Lesson recorded in OPTIMIZATION_r14.md: interpreted JVM expression work
parallelizes perfectly once the scan is row-spread; a Python stage adds
worker round-trips and (for fingerprint) a 30M-iteration md5 call loop
that numpy cannot vectorize.  This standalone copy keeps the candidates
reproducible; the shared batch machinery (tokenize/window/gather) is
the same offset arithmetic scripts/ab_substring_arrow_r14.py carries.

Run: python scripts/ab_textproj_arrow_r14.py   (parity gate, then the
interleaved A/B at sf0.1 + 100× with and without a 31-way spread)
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
from lstore_spark.llm.text import (  # noqa: E402
    _fingerprint_hof, _repetition_from_stats, _repetition_stats_hof)
from lstore_spark.session import get_spark  # noqa: E402


def _tokenize_batch(arr):
    """split on ' ' + drop empty tokens, all offsets numpy-side —
    byte-identical to the _SPARK_TOKENS macro."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if pa.types.is_large_string(arr.type) or pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    n = len(arr)
    toks = pc.split_pattern(arr, " ")
    lo = toks.offsets.to_numpy().astype(np.int64)
    child = toks.values
    off_np = np.frombuffer(child.buffers()[1], dtype=np.int32)
    vo = off_np[child.offset: child.offset + len(child) + 1].astype(np.int64)
    abs_idx = np.arange(lo[0], lo[-1], dtype=np.int64)
    t_len = vo[abs_idx + 1] - vo[abs_idx]
    dt_raw = lo[1:] - lo[:-1]
    doc_of_tok = np.repeat(np.arange(n, dtype=np.int64), dt_raw)
    keep = t_len > 0
    is_null = (np.asarray(toks.is_null()) if toks.null_count
               else np.zeros(n, dtype=bool))
    if toks.null_count:
        keep &= ~is_null[doc_of_tok]
    ts_len = t_len[keep]
    m = np.bincount(doc_of_tok[keep], minlength=n).astype(np.int64)
    flt_vals = child.take(pa.array(abs_idx[keep]))
    f_off = np.concatenate([[0], np.cumsum(m)]).astype(np.int32)
    flt_list = pa.ListArray.from_arrays(pa.array(f_off), flt_vals)
    joined = pc.binary_join(flt_list, " ")
    jo_np = np.frombuffer(joined.buffers()[1], dtype=np.int32)
    jo = jo_np[joined.offset: joined.offset + n + 1].astype(np.int64)
    jdata = np.frombuffer(joined.buffers()[2], dtype=np.uint8)
    cl = np.zeros(len(ts_len) + 1, dtype=np.int64)
    np.cumsum(ts_len, out=cl[1:])
    tok_base = np.zeros(n, dtype=np.int64)
    np.cumsum(m[:-1], out=tok_base[1:])
    return n, m, is_null, flt_vals, cl, tok_base, jo, jdata


def _window_slices(n, m, cl, tok_base, jo, w):
    import numpy as np

    nwin = np.maximum(m - (w - 1), 0)
    total_w = int(nwin.sum())
    if total_w == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, nwin
    win_doc = np.repeat(np.arange(n, dtype=np.int64), nwin)
    win_base = np.zeros(n, dtype=np.int64)
    np.cumsum(nwin[:-1], out=win_base[1:])
    j_local = np.arange(total_w, dtype=np.int64) - np.repeat(win_base, nwin)
    first_tok = np.repeat(tok_base, nwin) + j_local
    last_tok = first_tok + (w - 1)
    span_start = (jo[win_doc] + (cl[first_tok] - cl[tok_base[win_doc]])
                  + j_local)
    span_len = (cl[last_tok + 1] - cl[first_tok]) + (w - 1)
    return win_doc, span_start, span_len, nwin


def _gather(jdata, span_start, span_len):
    import numpy as np
    import pyarrow as pa

    total_w = len(span_start)
    total_b = int(span_len.sum())
    sb_base = np.zeros(total_w, dtype=np.int64)
    np.cumsum(span_len[:-1], out=sb_base[1:])
    pos = (np.repeat(span_start, span_len)
           + np.arange(total_b, dtype=np.int64)
           - np.repeat(sb_base, span_len))
    out_buf = jdata[pos]
    offs = np.concatenate([[0], np.cumsum(span_len)]).astype(np.int32)
    spans = pa.Array.from_buffers(
        pa.utf8(), total_w,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(out_buf.tobytes())])
    return spans, out_buf, sb_base


def fingerprint_arrow(docs):
    def gen(batches):
        from hashlib import md5

        import numpy as np
        import pyarrow as pa

        empty = pa.RecordBatch.from_arrays(
            [pa.array([], pa.int64())] * 3,
            ["doc_id", "fingerprint", "n_shingles"])
        for rb in batches:
            names = rb.schema.names
            ids = rb.column(names.index("doc_id"))
            arr = rb.column(names.index("text"))
            if len(arr) == 0:
                yield empty
                continue
            n, m, _nul, _flt, cl, tok_base, jo, jdata = _tokenize_batch(arr)
            sel = m >= 3
            if not sel.any():
                yield empty
                continue
            win_doc, s_start, s_len, nwin = _window_slices(
                n, m, cl, tok_base, jo, 3)
            spans, buf, sbase = _gather(jdata, s_start, s_len)
            mv = memoryview(buf)
            starts, ends = sbase.tolist(), (sbase + s_len).tolist()
            fp = np.fromiter(
                (int.from_bytes(md5(mv[s:e]).digest()[:6], "big")
                 for s, e in zip(starts, ends)),
                dtype=np.int64, count=len(starts))
            wb = np.zeros(n, dtype=np.int64)
            np.cumsum(nwin[:-1], out=wb[1:])
            fmin = np.minimum.reduceat(fp, wb[sel])
            tbl = pa.table({"d": pa.array(win_doc), "s": spans})
            gd = tbl.group_by(["d", "s"]).aggregate([("s", "count")])["d"] \
                .combine_chunks().to_numpy()
            nsh = np.bincount(gd, minlength=n)[sel].astype(np.int64)
            out_ids = ids.to_numpy(zero_copy_only=False)[sel]
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, pa.int64()), pa.array(fmin),
                 pa.array(nsh)],
                ["doc_id", "fingerprint", "n_shingles"])

    return docs.select("doc_id", "text").mapInArrow(
        gen, "doc_id long, fingerprint long, n_shingles long")


def repetition_stats_arrow(docs):
    def gen(batches):
        import numpy as np
        import pyarrow as pa

        empty = pa.RecordBatch.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int32()),
             pa.array([], pa.int32()), pa.array([], pa.int32()),
             pa.array([], pa.int64())],
            ["doc_id", "n_tokens", "n_distinct", "n_bg", "top_bg"])
        for rb in batches:
            names = rb.schema.names
            ids = rb.column(names.index("doc_id"))
            arr = rb.column(names.index("text"))
            if len(arr) == 0:
                yield empty
                continue
            n, m, is_null, flt_vals, cl, tok_base, jo, jdata = \
                _tokenize_batch(arr)
            nd = np.zeros(n, dtype=np.int64)
            if len(flt_vals):
                tok_doc = np.repeat(np.arange(n, dtype=np.int64), m)
                g = pa.table({"d": pa.array(tok_doc), "s": flt_vals}) \
                    .group_by(["d", "s"]).aggregate([("s", "count")])
                gd = g["d"].combine_chunks().to_numpy()
                nd = np.bincount(gd, minlength=n).astype(np.int64)
            top = np.zeros(n, dtype=np.int64)
            win_doc, s_start, s_len, _nwin = _window_slices(
                n, m, cl, tok_base, jo, 2)
            if len(win_doc):
                spans, _buf, _base = _gather(jdata, s_start, s_len)
                g = pa.table({"d": pa.array(win_doc), "s": spans}) \
                    .group_by(["d", "s"]).aggregate([("s", "count")])
                gd = g["d"].combine_chunks().to_numpy()
                gc = g["s_count"].combine_chunks().to_numpy()
                np.maximum.at(top, gd, gc)
            n_bg = np.maximum(m - 1, 0)
            yield pa.RecordBatch.from_arrays(
                [ids.cast(pa.int64()),
                 pa.array(m.astype(np.int32), mask=is_null),
                 pa.array(nd.astype(np.int32), mask=is_null),
                 pa.array(n_bg.astype(np.int32)), pa.array(top)],
                ["doc_id", "n_tokens", "n_distinct", "n_bg", "top_bg"])

    return docs.select("doc_id", "text").mapInArrow(
        gen, "doc_id long, n_tokens int, n_distinct int, n_bg int, "
             "top_bg long")


def main() -> None:
    spark = get_spark("ab-textproj-arrow-r14")
    spark.sparkContext.setLogLevel("ERROR")
    docs01 = load_table(spark, "/root/testdata/sf0.01", "documents") \
        .select("doc_id", "text")
    for a, b in ((fingerprint_arrow(docs01), _fingerprint_hof(docs01)),
                 (repetition_stats_arrow(docs01),
                  _repetition_stats_hof(docs01))):
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    docs = load_table(spark, "/tmp/sf100x", "documents")
    docs32 = docs.repartition(31)
    forms = {
        "fp_arrow_rp": lambda: noop(fingerprint_arrow(docs32)),
        "fp_hof_rp": lambda: noop(_fingerprint_hof(docs32)),
        "rep_arrow_rp": lambda: noop(
            _repetition_from_stats(repetition_stats_arrow(docs32))),
        "rep_hof_rp": lambda: noop(
            _repetition_from_stats(_repetition_stats_hof(docs32))),
    }
    for f in forms.values():
        f()
    t = {k: [] for k in forms}
    for _ in range(3):
        for k, f in forms.items():
            t0 = time.perf_counter()
            f()
            t[k].append(round(time.perf_counter() - t0, 3))
    out = {k: {"runs": v, "median": round(statistics.median(v), 3)}
           for k, v in t.items()}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
