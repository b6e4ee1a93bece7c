"""lstore_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference event-stream store
(esdb/lstore), extended with LLM-data-pipeline operators.

Architecture (SURVEY.md §3.2/§4.2): a curated, tested, scale-hardened
operator library over stock Catalyst — every operator is a DataFrame
constructor; Spark's optimizer is the only planner.
"""

from __future__ import annotations

from . import registry
from .catalog import SCHEMAS, load_table, load_tables, register_views
from .registry import ORACLE, QUERIES
from .session import get_spark, tune

registry.load_all()

__all__ = [
    "SCHEMAS", "QUERIES", "ORACLE",
    "load_table", "load_tables", "register_views",
    "get_spark", "tune",
]
