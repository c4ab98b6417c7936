"""extjdbc-parity JDBC reader/writer configuration.

The reference's entire config surface (reference: SURVEY.md §2C) maps onto
Spark ≥3.3 DSv2 JDBC options — including the two features the reference
existed to add, which are now native:

- LIMIT pushdown (reference: PropagateJDBCLimit.scala:14-28 +
  JDBCRDDWithLimit.scala:65-71,133) → ``pushDownLimit`` (default true);
- filter/column pushdown (reference: JDBCRelationWithLimit.scala:29-43) →
  ``pushDownPredicate`` + automatic column pruning;
plus aggregate and top-N pushdown the reference never had.

No database ships in this container, so these helpers only BUILD readers/
writers; integration is exercised when a JDBC URL is available.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

#: reference option name → DSv2 JDBC option name (identity unless renamed).
REFERENCE_OPTION_MAP: dict[str, str] = {
    "url": "url",
    "table": "dbtable",       # reference accepts `table` (ExtJdbcRelationProvider.scala:17)
    "dbtable": "dbtable",
    "driver": "driver",
    "fetchsize": "fetchsize",
    "batchsize": "batchsize",
    "isolationLevel": "isolationLevel",
    "truncate": "truncate",
    "createTableOptions": "createTableOptions",
    "partitionColumn": "partitionColumn",
    "lowerBound": "lowerBound",
    "upperBound": "upperBound",
    "numPartitions": "numPartitions",
}

#: Pushdown switches the reference implemented by hand, now Spark-native.
PUSHDOWN_DEFAULTS: dict[str, str] = {
    "pushDownPredicate": "true",
    "pushDownLimit": "true",
    "pushDownAggregate": "true",
    "pushDownOffset": "true",
}


def map_reference_options(options: dict[str, Any]) -> dict[str, str]:
    """Translate reference-style options to DSv2 JDBC options, layering the
    pushdown defaults under caller overrides. Unknown keys pass through —
    the reference forwarded unrecognized options to Spark the same way."""
    mapped = dict(PUSHDOWN_DEFAULTS)
    for k, v in options.items():
        mapped[REFERENCE_OPTION_MAP.get(k, k)] = str(v)
    return mapped


def jdbc_reader(spark: SparkSession, **options: Any) -> DataFrameReader:
    """`spark.read.format("jdbc")` with reference-option translation.
    `.load()` on the result gives a relation with limit/filter/column/
    aggregate pushdown — the superset of the reference's scan (op 1-6)."""
    return spark.read.format("jdbc").options(**map_reference_options(options))


def connect_with_retry(
    connect: Callable[[], Any],
    max_wait_s: float = 60.0,
    interval_s: float = 0.1,
    retryable: Callable[[Exception], bool] = lambda e: "too many clients" in str(e).lower(),
) -> Any:
    """Connection acquisition with retry/throttle — the reference retries
    'too many clients' errors every 100 ms for up to 60 s
    (reference: ExtJdbcUtils.scala:14-17,35-45). Generic over any
    zero-arg connect callable so sinks and readers share it."""
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            return connect()
        except Exception as exc:  # noqa: BLE001 — classification is caller-supplied
            if not retryable(exc) or time.monotonic() >= deadline:
                raise
            time.sleep(interval_s)


def write_extjdbc(df: DataFrame, url: str, table: str, mode: str = "error", **options: Any) -> None:
    """API-sugar parity with the reference's implicit writer
    ``df.write.extjdbc(url, table, props)`` (reference: package.scala:8-17).
    Uses Spark's native JDBC writer; for all-or-nothing semantics see
    :func:`spark_jdbc_limit_spark.sinks.transactional.write_jdbc_atomic`.
    """
    opts = map_reference_options({"url": url, "table": table, **options})
    df.write.format("jdbc").options(**opts).mode(mode).save()
