"""In-flight sink telemetry via Spark's Observation API.

A 100 TB pipeline wants row counts, null counts, and value bounds for
every batch it lands — but a separate ``df.agg(...)`` pass re-reads the
corpus, and a separate ``df.count()`` after the write re-runs the whole
plan. ``df.observe`` attaches aggregate expressions to the EXISTING job:
metrics accumulate on executors while the sink action runs and cost one
driver-side merge — zero extra scans, exactly-once semantics per action.

This is the idiomatic replacement for the reference's writer-side row
accounting (ExtJdbcUtils.scala:70-109 counts rows per partition batch
while inserting): same numbers, but collected by the engine instead of
hand-threaded through the write loop, and extensible to any aggregate
expression (null audits, min/max freshness bounds, checksum sums).

Constraints inherited from Spark (documented, test-pinned):
- metrics must be aggregate expressions with no DISTINCT and no
  non-deterministic functions;
- the Observation must be read AFTER an action has run the observed
  plan, and reflects that one action only;
- batch DataFrames only (streaming reports through
  ``StreamingQueryProgress.observedMetrics`` instead).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def standard_sink_metrics(*, null_audit_cols: tuple[str, ...] = ()) -> dict[str, Column]:
    """The default telemetry bundle: rows landed plus a null audit per
    requested column. ``count(lit(1))`` (never ``count(col)``) so the row
    count is unconditional."""
    metrics: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in null_audit_cols:
        metrics[f"n_null_{c}"] = F.count(F.lit(1)) - F.count(F.col(c))
    return metrics


def write_with_observations(
    df: DataFrame,
    sink: Callable[[DataFrame], None],
    metrics: dict[str, Column],
) -> dict[str, Any]:
    """Run ``sink`` (any action-triggering callable: ``.write`` chains,
    the atomic JDBC sink, a versioned-snapshot commit) over ``df`` with
    ``metrics`` observed in-flight; return the collected metric values.

    The metrics dict maps result names to aggregate Columns — each is
    aliased to its key, so callers read ``result["n_rows"]`` regardless
    of the expression inside. The observed node is injected ABOVE the
    caller's plan and below the sink, so filters/projections already in
    ``df`` are measured post-transformation (what actually landed, not
    what was scanned)."""
    obs = Observation()
    named = [col.alias(name) for name, col in metrics.items()]
    sink(df.observe(obs, *named))
    return dict(obs.get)
