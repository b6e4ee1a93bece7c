"""Custom stateful streaming operator (SURVEY.md §2.9): per-user running
aggregate held in explicit GroupState via applyInPandasWithState — the
Structured-Streaming form of an lstore consumer keeping per-key state
while following the log.

The update function is defined *nested* so cloudpickle ships it by value
to Python workers (a module-level reference would require the package on
the worker path).

Scale: state is keyed by user_id → sharded across executors by the
groupBy shuffle; each micro-batch touches only keys present in the batch.
With real unbounded streams add a timeout/TTL policy (GroupStateTimeout)
so abandoned keys age out — here the bounded availableNow drain keeps
state finite by construction.

Spark 4's successor API (``transformWithStateInPandas`` +
StatefulProcessor) was probed in this environment and fails at stream
start: its driver-side runner needs the ``google.protobuf`` Python
package, which is broken in this container and cannot be installed
(STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE / ImportError
'descriptor').  applyInPandasWithState is the supported stateful path
here; the processor shape ports 1:1 when protobuf is available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..registry import query
from .events import _events_stream, run_available_now

OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])
STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("s", DoubleType()),
])


def running_user_agg_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events stream → per-user (count, sum) maintained in GroupState;
    emits the updated running totals each micro-batch (update mode)."""
    import pandas as pd  # local so the closure is self-contained

    def update(key, pdfs, state):
        (user_id,) = key
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [s]})

    return (
        _events_stream(spark, sf_dir)
        .select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, OUT_SCHEMA, STATE_SCHEMA, "update",
            GroupStateTimeout.NoTimeout)
    )


@query("q_stream_apply_state")  # rows-only: stateful streaming (non-SQL op)
def q_stream_apply_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the stateful running aggregate with availableNow; final
    emitted row per user equals the batch groupBy (asserted in
    tests/test_stateful.py)."""
    out = run_available_now(
        running_user_agg_stream(spark, sf_dir),
        "q_stream_apply_state_sink", mode="update")
    return out
