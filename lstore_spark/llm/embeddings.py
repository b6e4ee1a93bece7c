"""§2.10 Embedding-column utilities: quantization and per-class
centroids — the vector-pipeline companions to similarity search (storage
compression and cluster summaries for IVF-style indexes).

All arithmetic widens float32→double before computing and uses only
IEEE-exact ops (abs/trunc/greatest, exact-decimal sums), so both engines
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .similarity import cosine


@query(
    "q_llm_emb_quantize",
    oracle="""
WITH amax AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS a
  FROM embeddings
)
SELECT vec_id, a AS amax,
       array_to_string(
         list_transform(embedding,
             x -> CAST(trunc(CAST(x AS DOUBLE) * 127.0 / a) AS INT)), ',')
         AS q8
FROM amax
""",
)
def q_llm_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector: q = trunc(x·127/amax).
    4× storage reduction for ANN candidate filtering; trunc (not round)
    because double→int casts agree across engines only for truncation.
    One scan, all HOFs — JVM-side, no shuffle."""
    em = load_table(spark, sf_dir, "embeddings")
    amax = F.expr("""
        aggregate(transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                  CAST(0.0 AS DOUBLE), (acc, v) -> greatest(acc, v))
    """).alias("amax")
    with_amax = em.select("vec_id", "embedding", amax)
    # Joined to a CSV string: the driver canonicalizer can't hash array
    # cells (CORRECTNESS_r01 q_agg_collect TypeError); int elements
    # stringify identically in both engines.
    return with_amax.select(
        "vec_id", "amax",
        F.array_join(
            F.expr("""
                transform(embedding,
                          x -> CAST(CAST(x AS DOUBLE) * 127.0D / amax AS INT))
            """),
            ",",
        ).alias("q8"),
    )


@query(
    "q_llm_emb_centroid",
    oracle="""
WITH elems AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
dims AS (
  SELECT label, i,
         CAST(CAST(SUM(CAST(v AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
           / COUNT(v) AS c,
         COUNT(*) AS n
  FROM elems GROUP BY label, i
)
SELECT label, MIN(n) AS n_vectors,
       array_to_string(
         list(CAST(trunc(c * 1000000.0) AS BIGINT) ORDER BY i), ',')
         AS centroid_u6
FROM dims GROUP BY label
""",
)
def q_llm_emb_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors (the IVF coarse-quantizer build step):
    posexplode → exact-decimal mean per (label, dim) → re-assemble in dim
    order.  Shuffles once on (label, dim) — 640 groups regardless of
    corpus size; the re-assembly list is bounded by dim=64."""
    em = load_table(spark, sf_dir, "embeddings")
    elems = em.select(
        "label", F.posexplode("embedding").alias("i", "v")
    ).select("label", "i", F.col("v").cast("double").alias("v"))
    dims = elems.groupBy("label", "i").agg(
        (F.sum(F.col("v").cast("decimal(30,8)")).cast("double")
         / F.count("v")).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    # Centroid elements are projected to microunit BIGINTs before the CSV
    # join: identical doubles → identical integers → identical strings,
    # sidestepping double→string formatting differences between engines
    # (and the driver canonicalizer's inability to hash array cells).
    return (
        dims.groupBy("label")
        .agg(
            F.min("n").alias("n_vectors"),
            F.array_join(
                F.expr(
                    # Spark double→BIGINT cast truncates toward zero, same
                    # as DuckDB's trunc(); a decimal cast would round.
                    "transform(array_sort(collect_list(struct(i, c))), "
                    "s -> CAST(s.c * 1000000.0D AS BIGINT))"
                ),
                ",",
            ).alias("centroid_u6"),
        )
    )

@query(
    "q_llm_emb_ivf_assign",
    oracle="""
WITH elems AS (
  SELECT label, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
cent AS (
  SELECT label, i,
         CAST(CAST(SUM(CAST(v AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
           / COUNT(v) AS c
  FROM elems GROUP BY label, i
),
vec AS (
  SELECT vec_id, label AS own_label,
         generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
pairs AS (
  SELECT vec.vec_id, vec.own_label, cent.label AS cand_label,
         ROUND(SUM(vec.v * cent.c)
               / (sqrt(SUM(vec.v * vec.v)) * sqrt(SUM(cent.c * cent.c))),
               6) AS cos_sim
  FROM vec JOIN cent ON vec.i = cent.i
  GROUP BY vec.vec_id, vec.own_label, cent.label
),
best AS (
  SELECT vec_id, own_label, cand_label, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cos_sim DESC, cand_label) AS rn
  FROM pairs
)
SELECT vec_id, own_label, cand_label AS ivf_label, cos_sim
FROM best WHERE rn = 1
""",
)
def q_llm_emb_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer assignment: route every vector to its
    nearest centroid (built per label, exact-decimal means as in
    q_llm_emb_centroid).  This is the partition-routing step of an IVF
    ANN index: at 100 TB the centroid table is tiny (n_lists rows) and
    BROADCASTS across the corpus scan; the argmax is a map-side-combined
    ``max_by`` per vector — one narrow shuffle of (vec_id, best) rows,
    nothing quadratic.  Tie-break: lowest candidate label."""
    em = load_table(spark, sf_dir, "embeddings")
    elems = em.select(
        "label", F.posexplode("embedding").alias("i", "v")
    ).select("label", "i", F.col("v").cast("double").alias("v"))
    cent = elems.groupBy("label", "i").agg(
        (F.sum(F.col("v").cast("decimal(30,8)")).cast("double")
         / F.count("v")).alias("c"))
    cvecs = (
        cent.groupBy("label")
        .agg(F.expr("transform(array_sort(collect_list(struct(i, c))), "
                    "s -> s.c)").alias("cvec"))
        .select(F.col("label").alias("cand_label"), "cvec")
    )
    pairs = (
        em.select("vec_id", F.col("label").alias("own_label"), "embedding")
        .crossJoin(F.broadcast(cvecs))
        .select("vec_id", "own_label", "cand_label",
                cosine("embedding", "cvec").alias("cos_sim"))
    )
    best = pairs.groupBy("vec_id", "own_label").agg(
        F.expr("max_by(struct(cand_label, cos_sim), "
               "struct(cos_sim, -cand_label))").alias("b"))
    return best.select(
        "vec_id", "own_label",
        F.col("b.cand_label").alias("ivf_label"),
        F.col("b.cos_sim").alias("cos_sim"))
