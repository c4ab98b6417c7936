"""Physical-plan assertions: prove optimizations FIRE, don't assume them.

The reference's verification method was golden-plan inspection — its README
pins the optimized/physical plans and the relation marker
`JDBCRelationWithLimit(test) [numPartitions=1] [limit=21]` as evidence the
limit pushdown happened (reference: README.md:56-64). This module is the
same discipline for the new engine: assert `PushedFilters`, pruned
`ReadSchema`, join strategy, and exchange counts in `explain("formatted")`
output, so a regression that silently un-pushes a filter fails a test
instead of a 100 TB bill.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain(mode) prints)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def assert_pushed_filters(df: DataFrame, *fragments: str) -> str:
    """Assert the parquet scan advertises PushedFilters containing every
    fragment (e.g. column names of pushed predicates)."""
    text = plan_text(df)
    pushed_lines = [ln for ln in text.splitlines() if "PushedFilters" in ln]
    assert pushed_lines, f"no PushedFilters in plan:\n{text}"
    joined = "\n".join(pushed_lines)
    for frag in fragments:
        assert frag in joined, f"filter fragment {frag!r} not pushed; got:\n{joined}"
    return joined


def assert_read_schema_cols(df: DataFrame, table_hint: str, expected_cols: set[str]) -> str:
    """Assert column pruning: the scan whose ReadSchema line mentions
    ``table_hint`` reads exactly ``expected_cols`` (order-insensitive)."""
    text = plan_text(df)
    for ln in text.splitlines():
        if "ReadSchema" in ln and table_hint in text:
            m = re.search(r"ReadSchema:\s*struct<(.*)>", ln)
            if not m:
                continue
            cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
            if cols == expected_cols:
                return ln
    raise AssertionError(
        f"no scan reads exactly {sorted(expected_cols)}; plan:\n{text}"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan — the scale metric.

    Every Exchange is a full network rewrite of its input at cluster scale;
    queries assert an upper bound so an accidental extra shuffle (lost
    partitioning, missed broadcast) fails fast.
    """
    # formatted mode names each operator once in a detail block header like
    # "(5) Exchange"; BroadcastExchange deliberately excluded (broadcasts
    # move one small side, not the whole stream). NOTE: matching the
    # "Exchange hashpartitioning(...)" simple-mode spelling here would
    # silently count 0 in formatted mode and make every bound vacuous.
    text = plan_text(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", text, re.MULTILINE))


def assert_broadcast_hash_join(df: DataFrame) -> None:
    text = plan_text(df)
    assert "BroadcastHashJoin" in text, f"expected BroadcastHashJoin; plan:\n{text}"


def assert_sort_merge_join(df: DataFrame) -> None:
    text = plan_text(df)
    assert "SortMergeJoin" in text, f"expected SortMergeJoin; plan:\n{text}"


def assert_no_python_udf_in_plan(df: DataFrame) -> None:
    """Relational queries must stay JVM-side — a BatchEvalPython /
    ArrowEvalPython node in a hot path means a 10-100× slowdown at scale."""
    text = plan_text(df)
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text, (
        f"Python UDF leaked into plan:\n{text}"
    )
