"""§2.8 Scalar function families (string / date / math / conditional /
cast / array / map / json / explode).

Cross-engine determinism notes baked into each query:
- per-row double arithmetic is IEEE-identical; only libm-backed functions
  (ln/exp/pow) get a ROUND() wrapper in both engines,
- double→int casts: Spark truncates, DuckDB rounds → always trunc() first,
- timestamp→string goes through explicit format strings, never raw casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_fn_string",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_up,
       lower(p_brand) AS brand_lo,
       substr(p_name, 1, 8) AS name_pfx,
       trim(concat('  ', p_type, '  ')) AS type_trim,
       length(p_name) AS name_len,
       replace(p_type, ' ', '_') AS type_us,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       reverse(p_brand) AS brand_rev,
       split_part(p_type, ' ', 1) AS type_first
FROM part
""",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = load_table(spark, sf_dir, "part")
    return pa.select(
        "p_partkey",
        F.upper("p_name").alias("name_up"),
        F.lower("p_brand").alias("brand_lo"),
        F.substring("p_name", 1, 8).alias("name_pfx"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit("  "))).alias("type_trim"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.reverse("p_brand").alias("brand_rev"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first"),
    )


@query(
    "q_fn_date",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dy,
       quarter(o_orderdate) AS qtr,
       dayofyear(o_orderdate) AS doy,
       isodow(o_orderdate) - 1 AS wd,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(o_orderdate AS DATE) + 30 AS plus30,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
FROM orders
""",
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family.  Day-of-week aligned to Monday=0 in both dialects
    (Spark weekday == DuckDB isodow-1)."""
    od = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return od.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekday("o_orderdate").alias("wd"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(d, 30).alias("plus30"),
        F.last_day(d).alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since"),
    )


@query(
    "q_fn_math",
    oracle="""
SELECT event_id,
       round(value, 1) AS v_round,
       CAST(floor(value) AS BIGINT) AS v_floor,
       CAST(ceil(value) AS BIGINT) AS v_ceil,
       abs(value - 250) AS v_absdiff,
       round(pow(value, 1.5), 4) AS v_pow,
       -- negative-domain guards (review r13): DuckDB sqrt/ln ERROR on
       -- negative input where Spark yields NaN/NULL — out-of-domain
       -- reads as NULL in both engines
       CASE WHEN value >= 0 THEN sqrt(value) END AS v_sqrt,
       CASE WHEN value + 1 > 0 THEN round(ln(value + 1), 6) END AS v_ln,
       round(exp(-value / 100), 8) AS v_exp,
       CAST(sign(value - 250) AS DOUBLE) AS v_sign,
       -- % not fmod (review r13): DuckDB's fmod takes the DIVISOR's
       -- sign (fmod(-3.5, 7) = 3.5) while its % and Spark's % are
       -- C-style sign-of-dividend
       value % 7 AS v_mod
FROM events
""",
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family.  sqrt/abs/floor/ceil/fmod are IEEE-exact; pow/ln/exp are
    libm-backed and rounded in both engines."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(v, 1).alias("v_round"),
        F.floor(v).alias("v_floor"),
        F.ceil(v).alias("v_ceil"),
        F.abs(v - 250).alias("v_absdiff"),
        F.round(F.pow(v, 1.5), 4).alias("v_pow"),
        # guarded like the oracle: negative domain -> NULL (Spark's
        # bare sqrt gives NaN, which is NOT the oracle's NULL)
        F.when(v >= 0, F.sqrt(v)).alias("v_sqrt"),
        F.when(v + 1 > 0, F.round(F.log(v + 1), 6)).alias("v_ln"),
        F.round(F.exp(-v / 100), 8).alias("v_exp"),
        F.signum(v - 250).alias("v_sign"),
        (v % 7).alias("v_mod"),
    )


@query(
    "q_fn_bitwise",
    oracle="""
SELECT event_id,
       event_id & 255 AS lo_byte,
       event_id | 4096 AS with_flag,
       xor(event_id, user_id) AS x,
       event_id << 3 AS shl,
       event_id >> 2 AS shr,
       CAST(bit_count(event_id) AS INT) AS popcnt,
       ~event_id AS inverted
FROM events WHERE event_id < 5000
""",
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family over int64 columns — the reference's entries are
    positional int64 slots (SURVEY §1.1), where flag masks and packed
    fields live in exactly these ops.  All exact integer semantics,
    identical across engines (operands kept non-negative so shift
    behavior can't diverge)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    e, u = F.col("event_id"), F.col("user_id")
    return ev.select(
        "event_id",
        e.bitwiseAND(F.lit(255)).alias("lo_byte"),
        e.bitwiseOR(F.lit(4096)).alias("with_flag"),
        e.bitwiseXOR(u).alias("x"),
        F.shiftleft(e, 3).alias("shl"),
        F.shiftright(e, 2).alias("shr"),
        F.bit_count(e).alias("popcnt"),
        F.bitwise_not(e).alias("inverted"),
    )


@query(
    "q_fn_conditional",
    oracle="""
SELECT event_id,
       CASE WHEN value >= 400 THEN 'high'
            WHEN value >= 100 THEN 'mid'
            ELSE 'low' END AS band,
       COALESCE(NULLIF(event_type, 'click'), 'silent') AS et_coalesced,
       NULLIF(user_id, 0) AS uid_nullable,
       GREATEST(value, CAST(user_id AS DOUBLE)) AS hi,
       LEAST(value, CAST(user_id AS DOUBLE)) AS lo,
       IF(event_type = 'purchase', value, 0.0) AS purchase_value
FROM events
""",
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v, u = F.col("value"), F.col("user_id").cast("double")
    return ev.select(
        "event_id",
        F.when(v >= 400, "high").when(v >= 100, "mid").otherwise("low").alias("band"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("click")), F.lit("silent"))
        .alias("et_coalesced"),
        F.nullif(F.col("user_id"), F.lit(0)).alias("uid_nullable"),
        F.greatest(v, u).alias("hi"),
        F.least(v, u).alias("lo"),
        F.when(F.col("event_type") == "purchase", v).otherwise(0.0)
        .alias("purchase_value"),
    )


@query(
    "q_fn_cast",
    oracle="""
SELECT event_id,
       CAST(trunc(value) AS BIGINT) AS v_long,
       CAST(trunc(value) AS INT) AS v_int,
       CAST(user_id AS DOUBLE) AS uid_dbl,
       CAST(user_id AS VARCHAR) AS uid_str,
       CAST(CAST(ts AS DATE) AS VARCHAR) AS day_str,
       CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day_ts,
       CAST('42' AS BIGINT) AS const_int,
       CAST(event_id % 2 AS BOOLEAN) AS id_odd
FROM events
""",
)
def q_fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast matrix.  double→int goes through trunc() because Spark's cast
    truncates while DuckDB's rounds — the one true dialect trap here."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("value").cast("long").alias("v_long"),
        F.col("value").cast("int").alias("v_int"),
        F.col("user_id").cast("double").alias("uid_dbl"),
        F.col("user_id").cast("string").alias("uid_str"),
        F.col("ts").cast("date").cast("string").alias("day_str"),
        F.col("ts").cast("date").cast("timestamp_ntz").alias("day_ts"),
        F.lit("42").cast("long").alias("const_int"),
        (F.col("event_id") % 2).cast("boolean").alias("id_odd"),
    )


@query(
    "q_fn_array",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_elem,
       array_to_string(list_transform(embedding[1:3],
                                      x -> CAST(trunc(CAST(x AS DOUBLE) * 2 * 1000000.0)
                                                AS BIGINT)), ',')
         AS head3_x2_u6,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
       list_contains(list_transform(embedding, x -> CAST(x AS DOUBLE) > 0.5),
                     true) AS any_gt_half
FROM embeddings
""",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops + higher-order functions over the embedding column.
    All float32 elements widen to double *before* arithmetic so both
    engines compute on identical doubles; the fold is sequential in list
    order in both (rounded once at the end)."""
    em = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    as_dbl = F.transform(e, lambda x: x.cast("double"))
    return em.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.element_at(e, 1).cast("double").alias("first_elem"),
        # Joined to a CSV string of microunit BIGINTs: the driver
        # canonicalizer can't hash array cells (q_agg_collect,
        # CORRECTNESS_r01), and double→string formatting differs across
        # engines (Spark prints 4.1E-4, DuckDB 0.00041).  double→BIGINT
        # cast truncates in Spark, matching DuckDB's trunc().
        F.array_join(
            F.transform(
                F.slice(e, 1, 3),
                lambda x: (x.cast("double") * 2 * 1000000.0).cast("bigint"),
            ),
            ",",
        ).alias("head3_x2_u6"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(as_dbl, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.exists(e, lambda x: x.cast("double") > 0.5).alias("any_gt_half"),
    )


@query(
    "q_fn_map",
    oracle="""
WITH src AS (
  -- malformed-JSON guard: see q_fn_json (review r13)
  SELECT event_id, event_type,
         CASE WHEN json_valid(props) THEN props END AS jp
  FROM events
)
SELECT event_id,
       array_to_string(
         list_sort(map_keys(MAP {'type': event_type, 'k': jp->>'$.k'})), ',')
         AS keys_sorted,
       element_at(MAP {'type': event_type, 'k': jp->>'$.k'}, 'k')[1]
         AS k_val,
       CAST(cardinality(MAP {'type': event_type, 'k': jp->>'$.k'}) AS INT)
         AS n_keys
FROM src
""",
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + access.  The raw map column stays out of the
    output (whole-map ordering is engine-specific); sorted keys and
    scalar lookups hash-compare exactly."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("k"), F.get_json_object("props", "$.k"),
    )
    return ev.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "k").alias("k_val"),
        F.size(m).alias("n_keys"),
    )


@query(
    "q_fn_json",
    oracle="""
WITH src AS (
  -- MALFORMED props degrade to NULL extraction (review r13): DuckDB's
  -- ->> ERRORS on invalid JSON where Spark's get_json_object returns
  -- NULL; is_valid still reads the RAW column
  SELECT event_id, props,
         CASE WHEN json_valid(props) THEN props END AS jp
  FROM events
)
SELECT event_id,
       jp->>'$.k' AS k_str,
       -- integer-regex gate, both engines (review r13): Spark's ANSI
       -- CAST throws on '12.5' where DuckDB's rounds to 13 — neither
       -- is a shared contract, so only bare-integer text parses
       CASE WHEN regexp_matches(jp->>'$.k', '^-?[0-9]+$')
            THEN CAST(jp->>'$.k' AS BIGINT) END AS k_int,
       CASE WHEN regexp_matches(jp->>'$.k', '^-?[0-9]+$')
            THEN CAST(jp->>'$.k' AS BIGINT) * 2 END AS k_doubled,
       COALESCE(json_valid(props), FALSE) AS is_valid
FROM src
""",
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload parsing — lstore blob payloads are app-encoded JSON;
    this is the typed-extraction surface (SURVEY.md §1.2).  is_valid is
    pinned NULL-props → false in BOTH dialects (Spark's isNotNull gives
    false natively; DuckDB's json_valid(NULL) is NULL, so the oracle
    COALESCEs — the contract, not the currently-null-free data; review
    r10)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    # regex-gated: an unguarded cast THROWS under Spark 4's ANSI
    # default on '12.5'/'n/a' payloads while DuckDB's CAST rounds —
    # only bare-integer text parses, identically in both engines
    # (review r13; the q_udf_scalar_python strict-int discipline)
    ki = F.when(k.rlike("^-?[0-9]+$"), k.cast("long"))
    return ev.select(
        "event_id",
        k.alias("k_str"),
        ki.alias("k_int"),
        (ki * 2).alias("k_doubled"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    )


@query(
    "q_fn_explode",
    oracle="""
SELECT vec_id,
       generate_subscripts(embedding, 1) - 1 AS pos,
       CAST(unnest(embedding) AS DOUBLE) AS val
FROM embeddings
WHERE vec_id < 50
""",
)
def q_fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array → rows with position (UDTF-shaped lateral)."""
    em = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return em.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))


@query(
    "q_fn_variant",
    oracle="""
WITH kk AS (
  SELECT event_type, props,
         -- typed twin of Spark's try_variant_get(..., 'bigint'),
         -- pinned by live probe (review r13): JSON numbers truncate
         -- toward zero (12.7 -> 12, -12.7 -> -12), numeric STRINGS
         -- parse only as bare integers ('12' -> 12, '12.5' -> NULL),
         -- booleans coerce to 1/0, everything else -> NULL
         CASE json_type(props, '$.k')
           WHEN 'BIGINT' THEN CAST(json_extract(props, '$.k') AS BIGINT)
           WHEN 'UBIGINT' THEN CAST(json_extract(props, '$.k') AS BIGINT)
           WHEN 'DOUBLE' THEN CAST(trunc(
                CAST(json_extract(props, '$.k') AS DOUBLE)) AS BIGINT)
           WHEN 'VARCHAR' THEN (CASE WHEN regexp_matches(
                  json_extract_string(props, '$.k'), '^-?[0-9]+$')
                THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END)
           WHEN 'BOOLEAN' THEN (CASE json_extract_string(props, '$.k')
                WHEN 'true' THEN 1 ELSE 0 END)
         END AS k
  FROM (SELECT event_type,
               CASE WHEN json_valid(props) THEN props END AS props
        FROM events)
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       COUNT(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                  THEN NULL ELSE 1 END) AS n_missing_present
FROM kk GROUP BY event_type
-- (kk's inner SELECT already NULLed malformed props, so the
--  json_* calls above never see invalid text)
""",
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4's VARIANT type: ``parse_json``
    once into the binary variant encoding, then typed ``variant_get``
    path extraction — the modern replacement for repeated
    ``get_json_object`` string re-parsing (each of which re-tokenizes
    the JSON text; variant parses once and extracts by offset).  The
    DuckDB oracle reads the same paths with its JSON functions.

    Scale: at 100 TB you'd persist the variant column ("shredded" into
    parquet by the writer) so path access is columnar; here the parse
    happens in the scan projection — still one pass."""
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json (review r13): parse_json THROWS on malformed
    # payloads under ANSI; a bad blob degrades to NULL variant -> NULL
    # extractions, matching the oracle's json_valid guard
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.missing", "string")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("k").alias("sum_k"),
             F.max("k").alias("max_k"),
             F.count("m").alias("n_missing_present"))
    )


@query(
    "q_fn_struct",
    oracle="""
SELECT l_orderkey, l_linenumber,
       struct_extract(struct_pack(q := l_quantity, p := l_extendedprice),
                      'q') AS s_qty,
       struct_extract(struct_extract(
           struct_pack(outer_ := struct_pack(f := l_returnflag,
                                             s := l_linestatus)),
           'outer_'), 'f') AS nested_flag,
       (struct_pack(a := l_returnflag, b := l_linestatus)
          = struct_pack(a := 'R', b := 'F')) AS is_rf,
       ((l_quantity, l_extendedprice)
          < (25.0, 30000.0)) AS below_cut
FROM lineitem WHERE l_orderkey <= 2000
""",
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT construction, field access, nesting, equality and ordering
    — the §2.8 family member for nested records (the other composite
    types — array/map/json/variant — have their own keys).  Struct
    COMPARISON is the interesting semantics both engines share:
    field-by-field lexicographic, so ``(q, p) < (25, 30000)`` is the
    row-value predicate SQL uses for keyset pagination at scale (one
    short-circuit comparison instead of OR-of-ANDs; Catalyst pushes it
    like any deterministic predicate).  Structs never cross the driver
    boundary — all projected columns are scalars."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") <= 2000))
    s = F.struct(F.col("l_quantity").alias("q"),
                 F.col("l_extendedprice").alias("p"))
    nested = F.struct(F.struct(
        F.col("l_returnflag").alias("f"),
        F.col("l_linestatus").alias("s")).alias("outer_"))
    return li.select(
        "l_orderkey", "l_linenumber",
        s.getField("q").alias("s_qty"),
        nested.getField("outer_").getField("f").alias("nested_flag"),
        (F.struct(F.col("l_returnflag").alias("a"),
                  F.col("l_linestatus").alias("b"))
         == F.struct(F.lit("R").alias("a"), F.lit("F").alias("b")))
        .alias("is_rf"),
        (F.struct(F.col("l_quantity"), F.col("l_extendedprice"))
         < F.struct(F.lit(25.0), F.lit(30000.0))).alias("below_cut"))
