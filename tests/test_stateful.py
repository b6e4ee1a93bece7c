"""Custom stateful streaming operator (applyInPandasWithState): final
per-user state must equal the batch groupBy; plus sampling properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from lstore_spark.catalog import load_table
from lstore_spark.registry import QUERIES


def test_apply_in_pandas_with_state_running_agg(spark, sf_dir):
    out = (
        QUERIES["q_stream_apply_state"](spark, sf_dir)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    batch = (load_table(spark, sf_dir, "events")
             .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events")))
    assert (sorted(map(tuple, out.collect()))
            == sorted(map(tuple, batch.collect())))


def test_sample_seeded_bounds_and_stability(spark, sf_dir):
    a = QUERIES["q_sample_seeded"](spark, sf_dir)
    b = QUERIES["q_sample_seeded"](spark, sf_dir)
    na, nb = a.count(), b.count()
    assert na == nb  # same seed, same partitioning → same sample
    total = load_table(spark, sf_dir, "events").count()
    assert 0.05 * total < na < 0.15 * total
