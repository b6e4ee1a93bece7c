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
    from .operators import aggregates, analytics, filters, joins, scans, setops, sorts, windows  # noqa: F401
    from .functions import scalar, udfs  # noqa: F401
    from .streaming import events, stateful  # noqa: F401
    from .llm import dedup, embeddings, multimodal, similarity, text  # noqa: F401
    from .sources import lstore_log, sinks  # noqa: F401
