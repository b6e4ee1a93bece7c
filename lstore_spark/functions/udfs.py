"""§2.11 UDF / UDAF / UDTF surface.

UDF discipline (SURVEY.md §4, pyspark guide): row-at-a-time Python UDFs
exist for API parity but every hot-path custom computation is a
vectorized pandas UDF (Arrow batches) or — better — a builtin-expression
rewrite.  Each UDF here has a builtin/SQL twin so the oracle can check it.
"""

from __future__ import annotations

import json
import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, ArrayType

from ..catalog import load_table
from ..registry import query


@query(
    "q_udf_scalar_python",
    oracle="""
WITH kk AS (
  SELECT event_id,
         -- strict JSON-integer-NUMBER gate on the RAW json text
         -- (review r13): TRY_CAST alone ROUNDS '12.5' to 13 and parses
         -- quoted strings, where the Python UDF's isinstance(v, int)
         -- rejects both — the raw text '"12"' / '12.5' / 'true' all
         -- fail the bare-integer regex, exactly like the UDF
         CASE WHEN regexp_matches(
                CAST(json_extract(props, '$.k') AS VARCHAR), '^-?[0-9]+$')
              THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k
  FROM events WHERE user_id < 40
)
SELECT event_id, k AS k_parsed,
       CASE WHEN k >= 50 THEN 'hi' ELSE 'lo' END AS k_band
FROM kk
""",
)
def q_udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF parsing the lstore-style blob payload.
    Correctness twin of get_json_object; kept off the 100 TB hot path
    (each row round-trips through the Python worker)."""

    @F.udf(returnType=LongType())
    def parse_k(props: str) -> int:
        # strict integer semantics, matching the oracle's TRY_CAST:
        # a non-integer payload ('12.5', 'n/a', true) parses to NULL in
        # BOTH engines instead of Python truncating where SQL errors
        # (review r11)
        try:
            v = json.loads(props).get("k")
            if isinstance(v, bool) or not isinstance(v, int):
                return None
            return v
        except Exception:
            return None

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    k = parse_k("props")
    return ev.select(
        "event_id",
        k.alias("k_parsed"),
        F.when(k >= 50, "hi").otherwise("lo").alias("k_band"),
    )


@query(
    "q_udf_pandas_scalar",
    oracle="""
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
FROM embeddings
""",
)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) pandas UDF: L2 norm per embedding.  Sequential
    float64 accumulation to mirror the SQL fold exactly; rounded once."""

    @F.pandas_udf(DoubleType())
    def l2_norm(vecs: pd.Series) -> pd.Series:
        def norm(v):
            acc = 0.0
            for x in v:
                xd = float(x)
                acc += xd * xd
            return math.sqrt(acc)
        return vecs.map(norm)

    em = load_table(spark, sf_dir, "embeddings")
    # round JVM-side: Python round() is half-to-EVEN and diverges from
    # DuckDB's half-away ROUND at exact dyadic ties (0.0078125 →
    # 0.007812 vs 0.007813); F.round matches DuckDB (0/250k divergences
    # in the r13 probe) — review r13
    return em.select("vec_id", F.round(l2_norm("embedding"), 6).alias("l2_norm"))


@query(
    "q_udaf_pandas_grouped_agg",
    oracle="""
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
             / COUNT(*), 6) AS trimmed_mean_value,
       MIN(n) AS n
FROM ranked
WHERE rn > CAST(floor(n * 0.1) AS BIGINT)
  AND rn <= n - CAST(floor(n * 0.1) AS BIGINT)
GROUP BY event_type
""",
)
def q_udaf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a grouped-agg pandas UDF: 10% trimmed mean of
    event value per type.  The oracle trims by rank over the same value
    order — ties at the trim boundary remove equal *values* either way,
    so the core multiset is identical; NULL values drop on BOTH sides
    before trimming (review r13 — a NaN poisoned numpy's mean where
    SQL's aggregate skips).  The mean itself follows the dec_frame_avg
    discipline: per-value Decimal(1e-8, HALF_UP) quantization summed
    exactly, then float(Σ)/n — bit-equal to the oracle's dec2dbl
    windowed sum, no pairwise-vs-sequential float drift (review r13).
    Also cross-checked against numpy in pytest."""
    from decimal import ROUND_HALF_UP, Decimal

    @F.pandas_udf(DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        s = v.dropna().sort_values().to_numpy()
        if len(s) == 0:
            return None
        k = int(len(s) * 0.1)
        core = s[k: len(s) - k] if len(s) > 2 * k else s
        q8 = Decimal("1E-8")
        acc = Decimal(0)
        for x in core:
            acc += Decimal(float(x)).quantize(q8, ROUND_HALF_UP)
        return float(acc) / len(core)

    ev = load_table(spark, sf_dir, "events")
    # A grouped-agg pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — counts come from a second agg.
    tm = ev.groupBy("event_type").agg(
        F.round(trimmed_mean("value"), 6).alias("trimmed_mean_value"))
    n = ev.groupBy("event_type").agg(F.count("value").alias("n"))
    return tm.join(n, "event_type")


@query(
    "q_udaf_pandas_window",
    oracle="""
SELECT event_id, user_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER w AS VARCHAR) AS DOUBLE)
         / COUNT(value) OVER w AS roll_avg
FROM events
WHERE user_id < 40
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
)
def q_udaf_pandas_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDF over a WindowSpec (the §2.11 surface row VERDICT r7
    flagged as the one missing UDF shape): a grouped-agg pandas UDF
    evaluated per bounded window frame — Spark slices each row's
    ROWS-frame into a pandas Series and the UDF returns the frame
    aggregate.  Semantically the q_win_sliding_avg rolling mean, so the
    oracle is the same decimal window sum.

    Hash discipline inside the UDF: per-frame Σ of Python
    ``Decimal(v).quantize(1e-8, HALF_UP)`` — bit-equal to the JVM's
    SUM(CAST(value AS DECIMAL(30,8))) (both round the exact binary
    expansion) — then float(Σ)/n, which matches CAST(dec AS DOUBLE) /
    COUNT exactly.  Bounded to user_id < 40 like the other UDF parity
    rows: per-frame UDF evaluation pays a Python call per ROW, which is
    the documented cost of this surface (the builtin twin is the hot
    path; this row proves the API works and agrees)."""
    from decimal import ROUND_HALF_UP, Decimal

    @F.pandas_udf(DoubleType())
    def dec_frame_avg(v: pd.Series) -> float:
        # Skip NULL/NaN rows and divide by the NON-NULL count — the
        # oracle's COUNT(value) OVER w has SQL NULL semantics, and
        # Decimal('NaN').quantize would raise InvalidOperation.  (The
        # fixture is null-free; this guards the contract, not the data.)
        q8 = Decimal("1E-8")
        s, n = Decimal(0), 0
        for x in v:
            if x is None or x != x:
                continue
            s += Decimal(float(x)).quantize(q8, ROUND_HALF_UP)
            n += 1
        return float(s) / n if n else None

    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-4, Window.currentRow))
    return ev.select(
        "event_id", "user_id",
        dec_frame_avg("value").over(w).alias("roll_avg"))


@query(
    "q_udf_grouped_map",
    oracle="""
SELECT event_id, event_type,
       ROUND((value - AVG(value) OVER (PARTITION BY event_type))
             / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 6) AS z_score
FROM events
""",
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): per-event-type z-score
    normalization — the split-apply-combine shape for feature pipelines.
    The pandas ddof=1 std matches STDDEV_SAMP; rounded in both engines.

    Scale: one shuffle on the group key; each group is processed as Arrow
    batches in a Python worker.  Groups must fit in worker memory — for
    100 TB groups, use the window-function form instead (same SQL as the
    oracle, fully JVM-side)."""
    from pyspark.sql.types import StructField, StructType, LongType, StringType

    out_schema = StructType([
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("z_score", DoubleType()),
    ])

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        std = v.std(ddof=1)
        # NULL (not NaN) for single-row / zero-variance groups — the
        # oracle's STDDEV_SAMP(1 row) -> NULL and x/0.0 -> NULL
        # semantics; a float64 NaN would ride through Arrow as NaN and
        # hash-drift (review r11)
        if pd.isna(std) or std == 0.0:
            z = pd.array([None] * len(v), dtype="Float64")
        else:
            # unrounded here; the JVM F.round below matches DuckDB's
            # half-away ROUND where pandas .round is half-to-even
            # (review r13, the l2_norm dyadic-tie class)
            z = ((v - v.mean()) / std).astype("Float64")
        return pd.DataFrame({
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "z_score": z,
        })

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    return (ev.groupBy("event_type").applyInPandas(normalize, out_schema)
            .withColumn("z_score", F.round("z_score", 6)))


@query(
    "q_udtf_python_native",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents WHERE doc_id < 50
)
SELECT doc_id, CAST(i - 1 AS INT) AS pos, ts[CAST(i AS INT)] AS token,
       CAST(length(ts[CAST(i AS INT)]) AS INT) AS tok_len
FROM tok, range(1, 256) AS g(i)
WHERE i <= len(ts)
""",
)
def q_udtf_python_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Python UDTF (Spark 4 @udtf class API): one doc row →
    (pos, token, tok_len) rows.  The class is defined in-function so
    cloudpickle ships it by value to workers."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, tok_len int")
    class Tokenize:
        def eval(self, text: str):
            if text is None:  # NULL text: no rows, like the oracle's
                return        # unnest over a NULL token list (review r11)
            pos = 0
            for tok in text.split(" "):
                if tok:
                    yield pos, tok, len(tok)
                    pos += 1

    spark.udtf.register("q_udtf_tokenize", Tokenize)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("q_udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, t.pos, t.token, t.tok_len
        FROM q_udtf_docs d, LATERAL q_udtf_tokenize(d.text) t
    """)


@query(
    "q_udtf_flatmap",
    oracle="""
SELECT doc_id, t.tok AS token
FROM documents, unnest(string_split(text, ' ')) AS t(tok)
WHERE doc_id < 100 AND t.tok <> ''
""",
)
def q_udtf_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function shape: one doc row → N token rows via a UDF returning
    an array + explode (the distributed flatMap; scales linearly)."""

    @F.udf(returnType=ArrayType(StringType()))
    def tokenize(text: str):
        if text is None:  # explode drops the row, like unnest(NULL)
            return []
        return [t for t in text.split(" ") if t]

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id", F.explode(tokenize("text")).alias("token"))
