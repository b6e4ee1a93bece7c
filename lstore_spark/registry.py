"""Query registry: the single source of truth for the driver contract.

Each operator module registers its queries with the ``@query`` decorator:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent DuckDB oracle SQL.  ``__spark_entry__.py`` simply re-exports
``QUERIES`` / ``ORACLE`` (SURVEY.md §2 is the inventory contract).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is DuckDB SQL or None
    (None → driver records the weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side effects run."""
    from .operators import aggregates, analytics, filters, joins, mutations, scans, setops, sorts, windows  # noqa: F401
    from .functions import scalar, udfs  # noqa: F401
    from .streaming import events, stateful  # noqa: F401
    from .llm import dedup, embeddings, multimodal, similarity, text  # noqa: F401
    from .sources import lstore_log, sinks  # noqa: F401


# ---------------------------------------------------------------------------
# Sweep ordering.  The driver's CORRECTNESS sweep iterates ``queries()`` in
# dict order under a time budget: round 1 stopped after 50 of 124 keys,
# leaving the window/setop/scalar/streaming/LLM families with no driver
# signal (VERDICT r1).  We therefore order the dict so (1) keys the driver
# has never verified run first, (2) keys it already hash-verified green in
# round 1 run next, and (3) slow side-effect keys (tempdir parquet writes,
# streaming sinks — 1.5-2.5 s each) run last, where a budget truncation
# costs the least evidence.

# Hash-verified green in CORRECTNESS_r01.json (q_agg_collect FAILED there,
# so it stays in the never-verified front group).
R1_VERIFIED: frozenset[str] = frozenset({
    "q_agg_global", "q_agg_groupby_hash", "q_agg_count_distinct",
    "q_agg_approx_distinct", "q_agg_grouping_sets", "q_agg_rollup",
    "q_agg_cube", "q_agg_having", "q_agg_stats", "q_agg_percentiles",
    "q_agg_bool", "q_subq_scalar", "q_subq_in", "q_subq_correlated",
    "q_tpch_q3_shipping", "q_tpch_q18_large_orders", "q_evt_funnel",
    "q_evt_retention", "q_ts_gapfill", "q_agg_argmax", "q_agg_stringagg",
    "q_fn_unpivot", "q_fn_histogram", "q_join_lateral",
    "q_sql_recursive_cte", "q_profile_table", "q_sample_seeded",
    "q_filter_int_range", "q_filter_int_eq", "q_filter_blob_eq",
    "q_filter_conjunction", "q_filter_disjunction_in",
    "q_filter_null_handling", "q_project_prune", "q_filter_like_regex",
    "q_join_inner_hash", "q_join_broadcast", "q_join_sort_merge",
    "q_join_left_outer", "q_join_full_outer", "q_join_left_semi",
    "q_join_left_anti", "q_join_cross_nl", "q_join_theta_range",
    "q_join_interval_range", "q_join_asof", "q_join_multiway_star",
    "q_scan_full", "q_scan_from_offset",
})

# Side-effect-heavy keys (measured 1.5-2.5 s each at sf0.01): always last.
SLOW_KEYS: tuple[str, ...] = (
    "q_sink_parquet",
    "q_source_lstore_log",
    "q_stream_foreachbatch_sink",
    "q_llm_multimodal_features",
    "q_llm_emb_kmeans",  # iterative: ~6 Lloyd rounds of actions (~14 s)
)


def sweep_order(keys=None) -> list[str]:
    """Registry keys in driver-sweep priority order (stable within tiers)."""
    keys = list(QUERIES if keys is None else keys)

    def tier(k: str) -> int:
        if k in SLOW_KEYS:
            return 3
        if k in R1_VERIFIED:
            return 2
        # Streaming keys are unverified but cost ~1-2 s of micro-batch
        # setup each; run them after the cheap unverified batch keys.
        if k.startswith("q_stream_") or k.startswith("q_source_stream"):
            return 1
        return 0

    return sorted(keys, key=tier)  # sort is stable → insertion order kept
