"""Plan-inspection layer: the engine's analogue of the reference's golden
query plans (reference: README.md:43-96 pins parsed/analyzed/optimized/
physical plans and the `JDBCRelationWithLimit(...) [limit=N]` marker as
proof the optimization fired)."""

from __future__ import annotations

from spark_jdbc_limit_spark.plans.verify import (
    assert_broadcast_hash_join,
    assert_no_python_udf_in_plan,
    assert_pushed_filters,
    assert_read_schema_cols,
    assert_sort_merge_join,
    count_exchanges,
    plan_text,
)

__all__ = [
    "assert_broadcast_hash_join",
    "assert_no_python_udf_in_plan",
    "assert_pushed_filters",
    "assert_read_schema_cols",
    "assert_sort_merge_join",
    "count_exchanges",
    "plan_text",
]
