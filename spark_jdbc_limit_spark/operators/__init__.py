"""Operator surface: every query/operator from SURVEY.md §2 as a named,
oracle-paired entry in a typed registry.

Importing this package populates the registry from the per-category
modules; ``all_queries()`` / ``all_oracles()`` back ``__spark_entry__.py``.
"""

from __future__ import annotations

from spark_jdbc_limit_spark.operators.registry import (
    QuerySpec,
    all_oracles,
    all_queries,
    get_query,
    query,
    REGISTRY,
)

# Register all query modules (import order = catalog order).
from spark_jdbc_limit_spark.operators import relational  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import joins  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import aggregates  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import windows  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import setops  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import scalars  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import dedup  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import similarity  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import text  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import multimodal  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import udfs  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import advanced  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import windowed_events  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import pipeline  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import file_sources  # noqa: E402,F401

__all__ = [
    "QuerySpec",
    "REGISTRY",
    "all_oracles",
    "all_queries",
    "get_query",
    "query",
]
