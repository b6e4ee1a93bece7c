"""Property-based equivalence proof for ``partitioned_topk`` — the
two-phase (partial-per-partition, then merge) exact top-k that backs
every similarity/ANN key (cosine, LSH, IVF, PQ-ADC).  Hypothesis drives
arbitrary score multisets — heavy ties included — through the operator
and through the textbook ``row_number() OVER (PARTITION BY ...)``
reference; any divergence (dropped survivor, wrong tie-break, rank gap)
fails.  Scores are drawn from a tiny set precisely to force tie-breaks
through the (cos_sim DESC, cand_id ASC) struct ordering."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from lstore_spark.llm.similarity import partitioned_topk

_ROW = st.tuples(
    st.integers(min_value=0, max_value=3),      # key (few → big groups)
    st.integers(min_value=0, max_value=50),     # cand_id
    st.sampled_from([0.0, 0.25, 0.5, 0.5, 1.0, -1.0]),  # score (ties!)
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_ROW, min_size=1, max_size=60, unique_by=lambda r: (r[0], r[1])),
       k=st.integers(min_value=1, max_value=5))
def test_partitioned_topk_equals_window_reference(spark, rows, k):
    df = spark.createDataFrame(rows, "query_id long, cand_id long, cos_sim double")
    # spread rows over several input partitions so phase 1 genuinely
    # produces competing partials that phase 2 must merge correctly
    df = df.repartition(4)

    got = partitioned_topk(df, "query_id", k)
    got_rows = {(r.query_id, r.rank, r.cand_id, r.cos_sim)
                for r in got.collect()}

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc())
    ref = (df.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k))
    ref_rows = {(r.query_id, r.rank, r.cand_id, r.cos_sim)
                for r in ref.collect()}

    assert got_rows == ref_rows


def _morton_ref(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=st.lists(st.tuples(st.integers(min_value=0, max_value=65535),
                                st.integers(min_value=0, max_value=65535)),
                      min_size=1, max_size=30))
def test_zorder_key_matches_python_reference(spark, pairs):
    """The JVM-side Morton fold must agree bit-for-bit with the textbook
    interleave — the clustering rewrite's correctness rests on it."""
    from lstore_spark.sources.sinks import zorder_key

    df = spark.createDataFrame(pairs, "a long, b long")
    got = {(r.a, r.b): r.z
           for r in df.select("a", "b", zorder_key("a", "b").alias("z")).collect()}
    for a, b in pairs:
        assert got[(a, b)] == _morton_ref(a, b)
