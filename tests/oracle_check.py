"""Local replica of the driver's DuckDB-oracle differential check.

Stricter than it needs to be: cells are canonicalized to exact strings
(full float repr — no tolerance) and compared as sorted multisets, so a
query that passes here passes any reasonable order-insensitive hash.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from dataclasses import dataclass, field

import duckdb
import numpy as np

from lstore_spark.catalog import TABLE_NAMES


def default_sf_dir() -> str:
    """The harness-wide default grade fixture — re-export of THE single
    definition, which lives in the package so package code can import
    it too (lstore_spark.catalog.default_sf_dir; review r11 unified the
    harness copies here, review r13 moved it where llm/bpe.py can also
    reach it)."""
    from lstore_spark.catalog import default_sf_dir as _d

    return _d()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, decimal.Decimal):
        return canon_cell(float(v))
    if isinstance(v, _dt.datetime):
        try:
            if v != v:  # pd.NaT
                return "<NULL>"
        except Exception:
            pass
        # DuckDB's .df() widens DATE to a midnight datetime64 while
        # Spark's toPandas keeps datetime.date — normalize exact-midnight
        # datetimes to date form so the two fetch paths agree (the driver
        # passed q_fn_cast's mixed date/timestamp output in r2, so its
        # canonicalizer tolerates this; replicate that tolerance).
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    return str(v)


def driver_canon(cols: list[str], rows: list[tuple]):
    """Replica of the DRIVER's canonicalizer (the CORRECTNESS sweep):
    a pandas ``sort_values`` over all columns in name order, with **no**
    special handling for array/map cells — so an output column holding
    ndarray/list cells raises TypeError here exactly as it did in the
    driver (CORRECTNESS_r01 ``q_agg_collect``:
    ``TypeError: unhashable type: 'numpy.ndarray'``).

    ``compare()`` runs this on both engines' results purely as a
    crash-check, so the "array-typed oracle output" failure class can
    never regress silently again.
    """
    import pandas as pd

    df = pd.DataFrame(rows, columns=cols)
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@dataclass
class CompareResult:
    key: str
    ok: bool
    detail: str = ""
    spark_rows: int = 0
    duck_rows: int = 0
    mismatches: list = field(default_factory=list)


def compare(key: str, spark_df, con, sql: str, max_report: int = 5) -> CompareResult:
    # Fetch BOTH sides the way the driver does: Spark via toPandas()
    # (Arrow), DuckDB via .df().  fetchall()/collect() hide a whole
    # failure class — DuckDB HUGEINT (integer SUM windows) and nullable
    # ints degrade to float64 only on the pandas path, which is exactly
    # how the driver's r2 q_ts_interval_coalesce hash-fail slipped past
    # the old fetchall() harness (VERDICT r2 items 2-3).
    s_pdf = spark_df.toPandas()
    s_cols = list(s_pdf.columns)
    s_rows = [tuple(r) for r in s_pdf.itertuples(index=False, name=None)]
    d_pdf = con.execute(sql).df()
    d_cols = list(d_pdf.columns)
    d_rows = [tuple(r) for r in d_pdf.itertuples(index=False, name=None)]

    res = CompareResult(key=key, ok=True,
                        spark_rows=len(s_rows), duck_rows=len(d_rows))
    if sorted(s_cols) != sorted(d_cols):
        res.ok = False
        res.detail = f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}"
        return res
    if len(s_rows) != len(d_rows):
        res.ok = False
        res.detail = f"rowcount: spark={len(s_rows)} duck={len(d_rows)}"
        return res
    try:
        driver_canon(s_cols, s_rows)
        driver_canon(d_cols, d_rows)
    except Exception as e:  # the driver would record this key as err
        res.ok = False
        res.detail = f"driver-style canonicalizer crash: {type(e).__name__}: {e}"
        return res
    cs = canon_rows(s_cols, s_rows)
    cd = canon_rows(d_cols, d_rows)
    if cs != cd:
        res.ok = False
        # Multiset diff, not positional zip: both lists are sorted, so
        # one inserted/missing row would shift every later pair and a
        # zip would report N bogus "differences" of unrelated rows
        # (review r11).  Report rows genuinely private to each side.
        import collections
        only_s = collections.Counter(cs) - collections.Counter(cd)
        only_d = collections.Counter(cd) - collections.Counter(cs)
        res.detail = (f"values: {sum(only_s.values())} spark-only / "
                      f"{sum(only_d.values())} duck-only rows "
                      f"(of {len(cs)})")
        # zip_longest, not zip: a one-sided diff (extra/missing row on
        # one side only) must still show its example rows, and when both
        # sides have private rows the pairing is positional convenience,
        # not a claimed row-to-row correspondence (ADVICE r11).
        import itertools
        res.mismatches = list(itertools.zip_longest(
            sorted(only_s.elements())[:max_report],
            sorted(only_d.elements())[:max_report]))
    return res
