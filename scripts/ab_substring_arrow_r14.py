"""REJECTED candidate (r14 session 2): Arrow-native span-runs generator
for substring dedup (mapInArrow + pyarrow C++ split/join/group_by).

History: parity-verified (exceptAll 0 vs the HOF runs at sf0.01 +
degenerate/multibyte docs; forced-gate DuckDB oracle compare green) and
briefly SHIPPED on the strength of a 2x interleaved win at the 100x
fixture (32.9 s vs 66.5 s median) -- but both arms of that A/B ran on
the under-split 2-partition text scan.  Once catalog.spread_rows fixed
the stage parallelism (the real lever), the HOF span-runs form won
decisively: 7.8 s vs 20.5 s median at 100x (scripts/ab_repart_r14.json)
-- interpreted HOFs parallelize perfectly, the Python worker round-trip
does not.  The HOF form + spread_rows ships; this standalone copy keeps
the candidate reproducible.
"""
import sys, time, json, statistics
sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from lstore_spark.session import get_spark
from lstore_spark.catalog import load_table
from lstore_spark.llm.dedup import _span_windows, _span_runs, _SUBSTR_W, substring_dedup
from lstore_spark.llm.text import _SPARK_TOKENS


def span_runs_arrow(docs, w):
    """(doc_id-free) per-doc distinct spans with multiplicities, all in
    pyarrow/numpy via mapInArrow: split -> drop empty tokens -> join by
    ' ' -> slice w-token windows as byte ranges -> exact C++ hash
    group_by (doc, span)."""
    def gen(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        empty = pa.RecordBatch.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64())],
            ["span", "cnt"])
        for rb in batches:
            arr = rb.column(rb.schema.get_field_index("text"))
            if pa.types.is_large_string(arr.type) or pa.types.is_null(arr.type):
                arr = arr.cast(pa.string())
            n = len(arr)
            if n == 0:
                yield empty
                continue
            toks = pc.split_pattern(arr, " ")
            lo = toks.offsets.to_numpy().astype(np.int64)
            child = toks.values
            off_np = np.frombuffer(child.buffers()[1], dtype=np.int32)
            vo = off_np[child.offset: child.offset + len(child) + 1].astype(np.int64)
            n_tok_raw = int(lo[-1] - lo[0])
            abs_idx = np.arange(lo[0], lo[-1], dtype=np.int64)
            t_len = vo[abs_idx + 1] - vo[abs_idx]
            dt_raw = lo[1:] - lo[:-1]
            doc_of_tok = np.repeat(np.arange(n, dtype=np.int64), dt_raw)
            keep = t_len > 0
            if toks.null_count:
                null_doc = np.asarray(toks.is_null())
                keep &= ~null_doc[doc_of_tok]
            ts_len = t_len[keep]
            ts_doc = doc_of_tok[keep]
            m = np.bincount(ts_doc, minlength=n).astype(np.int64)
            nwin = np.maximum(m - (w - 1), 0)
            total_w = int(nwin.sum())
            if total_w == 0:
                yield empty
                continue
            # normalized per-doc text = filtered tokens joined by ' '
            flt_vals = child.take(pa.array(abs_idx[keep]))
            f_off = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(m, out=f_off[1:].astype(np.int64, copy=False)[:])
            f_off = np.concatenate([[0], np.cumsum(m)]).astype(np.int32)
            flt_list = pa.ListArray.from_arrays(pa.array(f_off), flt_vals)
            joined = pc.binary_join(flt_list, " ")
            jo_np = np.frombuffer(joined.buffers()[1], dtype=np.int32)
            jo = jo_np[joined.offset: joined.offset + n + 1].astype(np.int64)
            jdata = np.frombuffer(joined.buffers()[2], dtype=np.uint8)
            # cumulative filtered-token byte lengths
            cl = np.zeros(len(ts_len) + 1, dtype=np.int64)
            np.cumsum(ts_len, out=cl[1:])
            tok_base = np.zeros(n, dtype=np.int64)
            np.cumsum(m[:-1], out=tok_base[1:])
            win_doc = np.repeat(np.arange(n, dtype=np.int64), nwin)
            win_base = np.zeros(n, dtype=np.int64)
            np.cumsum(nwin[:-1], out=win_base[1:])
            j_local = (np.arange(total_w, dtype=np.int64)
                       - np.repeat(win_base, nwin))
            first_tok = np.repeat(tok_base, nwin) + j_local
            last_tok = first_tok + (w - 1)
            span_start = (jo[win_doc]
                          + (cl[first_tok] - cl[tok_base[win_doc]])
                          + j_local)
            span_len = (cl[last_tok + 1] - cl[first_tok]) + (w - 1)
            total_b = int(span_len.sum())
            sb_base = np.zeros(total_w, dtype=np.int64)
            np.cumsum(span_len[:-1], out=sb_base[1:])
            pos = (np.repeat(span_start, span_len)
                   + np.arange(total_b, dtype=np.int64)
                   - np.repeat(sb_base, span_len))
            out_buf = jdata[pos]
            offs = np.zeros(total_w + 1, dtype=np.int32)
            np.cumsum(span_len, out=offs[1:].astype(np.int64, copy=False)[:])
            offs = np.concatenate([[0], np.cumsum(span_len)]).astype(np.int32)
            spans = pa.Array.from_buffers(
                pa.utf8(), total_w,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(out_buf.tobytes())])
            tbl = pa.table({"d": pa.array(win_doc), "s": spans})
            g = tbl.group_by(["d", "s"]).aggregate([("s", "count")])
            yield pa.RecordBatch.from_arrays(
                [g["s"].combine_chunks(),
                 g["s_count"].combine_chunks().cast(pa.int64())],
                ["span", "cnt"])
    return docs.select("text").mapInArrow(gen, "span string, cnt long")


def main():
    spark = get_spark("proto-span-arrow")
    spark.sparkContext.setLogLevel("ERROR")
    w = _SUBSTR_W

    # ---- parity at sf0.01 + degenerates
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    edge = spark.createDataFrame(
        [(900001, "single"), (900002, " ".join(["t%d" % i for i in range(7)])),
         (900003, " ".join(["t%d" % i for i in range(8)])),
         (900004, ("rep tok " * 20).strip()), (900005, None), (900006, ""),
         (900007, "  x  " * 10), (900008, ("żółć 日本語 🎉 mixé " * 5).strip())],
        ["doc_id", "text"])
    dd = docs.select("doc_id", "text").unionByName(edge)
    ref = (_span_runs(dd.select("doc_id", F.expr(_SPARK_TOKENS).alias("ts"))
                      .select("doc_id", _span_windows(w).alias("spans")))
           .select("span", "cnt"))
    got = span_runs_arrow(dd, w)
    d1, d2 = got.exceptAll(ref).count(), ref.exceptAll(got).count()
    print("parity exceptAll:", d1, d2, flush=True)
    if d1 or d2:
        print(got.exceptAll(ref).take(5))
        print(ref.exceptAll(got).take(5))
        return

    # ---- interleaved timing at 100x: full aggregate both ways
    def full(form):
        docs100 = load_table(spark, "/tmp/sf100x", "documents")
        if form == "arrow":
            runs = span_runs_arrow(docs100, w)
        else:
            runs = _span_runs(
                docs100.select("doc_id", F.expr(_SPARK_TOKENS).alias("ts"))
                .select("doc_id", _span_windows(w).alias("spans")))
        return (runs.groupBy("span")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("cnt").alias("n_occ"))
                .filter(F.col("n_docs") > 1))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for form in ("arrow", "hof"):
        noop(full(form))  # warm
    times = {"arrow": [], "hof": []}
    for i in range(3):
        for form in ("arrow", "hof"):
            t0 = time.perf_counter()
            noop(full(form))
            times[form].append(round(time.perf_counter() - t0, 2))
            print(f"# {form} {times[form][-1]}", flush=True)
    print(json.dumps({k: {"runs": v, "median": statistics.median(v)}
                      for k, v in times.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
